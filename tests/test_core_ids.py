"""Identifier-generation parity with the reference's golden shas.

Goldens from gleanerio/gleaner ``internal/common/identifier_test.go``
(sha values at lines 485-576, path expectations at 121-350); fixture
files are read directly from the read-only reference checkout and the
tests skip when it is absent.
"""

import pytest

from gleaner_spark.core.ids import (
    IDENTIFIER_SHA,
    IDENTIFIER_STRING,
    JSON_PATHS_DEFAULT,
    JSON_SHA,
    NORMALIZED_JSON_SHA,
    generate_identifier,
    get_identifier_by_path,
    get_identifier_by_paths,
    get_sha,
    go_sprint_list,
    move_to_front,
)
from tests.conftest import reference_fixture

IDENT_DIR = "internal/common/testdata/identifier"


def load(name: str) -> str:
    with open(reference_fixture(f"{IDENT_DIR}/{name}")) as f:
        return f.read()


def test_get_sha_golden():
    assert get_sha("[idenfitier]") == "0fe143f05d6dbff260874a9a6e8da77243c74db0"


# --- TestGenerateFileShaIdentifier goldens (identifier_test.go:485-541) ---

def test_filesha_array_multiple():
    jsonld = load("jsonIdentifierArrayMultiple.json")
    ident = generate_identifier(jsonld, JSON_SHA)
    assert ident.unique_id == "7bff4b860c6df6f12f408955d0e78da2dea9e268"
    assert ident.identifier_type == JSON_SHA


def test_normalizedsha_array_multiple_double_hex_quirk():
    jsonld = load("jsonIdentifierArrayMultiple.json")
    ident = generate_identifier(jsonld, NORMALIZED_JSON_SHA)
    assert ident.unique_id == (
        "37626666346238363063366466366631326634303839353564306537386461326465613965323638"
    )
    assert ident.identifier_type == NORMALIZED_JSON_SHA
    assert len(ident.unique_id) == 80


def test_normalizedsha_identifier_path_double_hex():
    jsonld = load("jsonIdentifierPath.json")
    ident = generate_identifier(jsonld, NORMALIZED_JSON_SHA)
    assert ident.unique_id == (
        "38646664383435363837333837653337663236383132343335313436613363343462376231346262"
    )


def test_filesha_identifier_path():
    jsonld = load("jsonIdentifierPath.json")
    ident = generate_identifier(jsonld, JSON_SHA)
    assert ident.unique_id == "8dfd845687387e37f26812435146a3c44b7b14bb"


# --- TestGenerateJsonPathIdentifier goldens (identifier_test.go:543-576) ---

def test_identifiersha_id_first():
    jsonld = load("jsonIdentifierArrayMultiple.json")
    ident = generate_identifier(jsonld, IDENTIFIER_SHA, "$['@id']")
    assert ident.unique_id == "0fe143f05d6dbff260874a9a6e8da77243c74db0"
    assert ident.matched_path == "$['@id']"
    assert ident.identifier_type == IDENTIFIER_SHA


def test_identifiersha_default_path_sorted_multimatch():
    jsonld = load("jsonIdentifierArrayMultiple.json")
    ident = generate_identifier(jsonld, IDENTIFIER_SHA, "")
    assert ident.unique_id == "54f213d3196d3040511c0fc4817bf70a05efef05"
    assert ident.matched_path == (
        "$.identifier[?(@.propertyID=="
        "'https://registry.identifiers.org/registry/doi')].value"
    )
    # fmt.Sprint([]string) formatting (identifier_test.go:590)
    assert ident.matched_string == (
        "[doi:10.1575/1912/bco-dmo.2343.1 doi:10.1575/1912/bco-dmo.2343.1N]"
    )


def test_identifier_string_type():
    jsonld = load("jsonIdentifierArrayMultiple.json")
    ident = generate_identifier(jsonld, IDENTIFIER_STRING, "$['@id']")
    assert ident.unique_id == "[idenfitier]"
    assert ident.identifier_type == IDENTIFIER_STRING


# --- TestValidJsonPathInput expectations (identifier_test.go:121-215) ---

def test_path_at_id():
    jsonld = load("jsonId.json")
    values = get_identifier_by_path("$['@id']", jsonld)
    assert go_sprint_list(values) == "[idenfitier]"


def test_path_identifier_string():
    jsonld = load("jsonId.json")
    values = get_identifier_by_path("$.identifier", jsonld)
    assert go_sprint_list(values) == "[doi:10.1575/1912/bco-dmo.2343.1]"


def test_path_filter_array_sorted():
    jsonld = load("jsonId.json")
    values = get_identifier_by_path(
        "$.identifierSArray[?(@.propertyID=="
        "'https://registry.identifiers.org/registry/doi')].value",
        jsonld,
    )
    assert go_sprint_list(values) == (
        "[doi:10.1575/1912/bco-dmo.2343.1 doi:10.1575/1912/bco-dmo.2343.1N]"
    )


# --- TestValidJsonPathsInput cascades (identifier_test.go:217-350) ---

def test_cascade_falls_through_to_id():
    jsonld = load("jsonIdPaths.json")
    found = get_identifier_by_paths(
        ["$.identifier.value", "$.identifier", "$['@id']"], jsonld)
    assert found is not None
    values, path = found
    assert go_sprint_list(values) == "[idenfitier]"
    assert path == "$['@id']"


def test_cascade_identifier_scalar():
    jsonld = load("jsonIdentifierPath.json")
    found = get_identifier_by_paths(
        ["$.identifier.value", "$.identifier", "$['@id']"], jsonld)
    values, path = found
    assert go_sprint_list(values) == "[doi:10]"
    assert path == "$.identifier"


def test_cascade_identifier_object():
    jsonld = load("jsonIdentifierObjectPath.json")
    found = get_identifier_by_paths(
        ["$.identifier.value", "$.identifier", "$['@id']"], jsonld)
    values, path = found
    assert go_sprint_list(values) == "[doi:10.1575/1912/bco-dmo.2343.1]"
    assert path == "$.identifier.value"


def test_wifire_graph_dataset_id():
    jsonld = load("jsonGraphWifire.json")
    found = get_identifier_by_paths(JSON_PATHS_DEFAULT, jsonld)
    values, path = found
    assert go_sprint_list(values) == (
        "[https://wifire-data.sdsc.edu/dataset/8fd44c38-f6d3-429c-a785-1498dfaa2a6a]"
    )
    assert path == "$['@graph'][?(@['@type']=='schema:Dataset')]['@id']"


def test_problem_child_iris_falls_to_id():
    jsonld = load("problemChildIris.json")
    found = get_identifier_by_paths(
        ["$.identifier[?(@.propertyID=="
         "'https://registry.identifiers.org/registry/doi')].value",
         "$.identifier.value", "$.identifier", "$['@id']"], jsonld)
    values, path = found
    assert go_sprint_list(values) == "[https://ds.iris.edu/ds/products/emtf/]"
    assert path == "$['@id']"


def test_problem_child_opentopo():
    jsonld = load("problemChildOpentop.json")
    found = get_identifier_by_paths(
        ["$.identifier[?(@.propertyID=="
         "'https://registry.identifiers.org/registry/doi')].value",
         "$.identifier.value", "$.identifier", "$['@id']"], jsonld)
    values, path = found
    assert go_sprint_list(values) == "[OTDS.062020.32611.1]"
    assert path == "$.identifier.value"


# --- MoveToFront semantics (config/utils.go:14-33) ---

def test_move_to_front_existing():
    assert move_to_front("c", ["a", "b", "c", "d"]) == ["c", "a", "b", "d"]


def test_move_to_front_already_first():
    assert move_to_front("a", ["a", "b"]) == ["a", "b"]


def test_move_to_front_absent_drops_last():
    # reference quirk: a needle not in the list displaces the final element
    assert move_to_front("x", ["a", "b", "c"]) == ["x", "a", "b"]
