"""Property-based URDNA2015 validation: canonicalization must be
invariant under blank-node relabeling and quad reordering — the defining
guarantee of the algorithm (and what the graph URN's stability across
partitionings/retries depends on).  Randomized datasets exercise shared
bnodes, cycles, literals and named graphs far beyond the golden tests.

Also: preflight (V2) fail-fast checks.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from gleaner_spark.core.jsonld import (
    CanonicalizationBudgetError,
    Quad,
    RdfTerm,
    urdna2015,
)

IRIS = ["http://e/a", "http://e/b"]
PREDS = ["http://p/1", "http://p/2", "http://p/3"]
LITS = [("v", None), ("w", "http://www.w3.org/2001/XMLSchema#integer")]


@st.composite
def datasets(draw):
    n_b = draw(st.integers(min_value=1, max_value=5))
    bnodes = [f"_:x{i}" for i in range(n_b)]
    n_q = draw(st.integers(min_value=1, max_value=10))
    quads = []
    for _ in range(n_q):
        s = draw(st.sampled_from(bnodes + IRIS))
        p = draw(st.sampled_from(PREDS))
        okind = draw(st.integers(min_value=0, max_value=2))
        if okind == 0:
            o = RdfTerm("blank", draw(st.sampled_from(bnodes)))
        elif okind == 1:
            o = RdfTerm("iri", draw(st.sampled_from(IRIS)))
        else:
            v, dt = draw(st.sampled_from(LITS))
            o = RdfTerm("literal", v, dt)
        g = None
        if draw(st.booleans()):
            g = RdfTerm("iri", "http://g/1")
        s_term = RdfTerm("blank", s) if s.startswith("_:") else RdfTerm("iri", s)
        quads.append(Quad(s_term, RdfTerm("iri", p), o, g))
    return bnodes, quads


def _relabel(quads, mapping):
    def m(t):
        if t is not None and t.kind == "blank":
            return t._replace(value=mapping[t.value])
        return t

    return [Quad(m(q.s), q.p, m(q.o), m(q.g)) for q in quads]


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=datasets(), seed=st.randoms(use_true_random=False))
def test_urdna_invariant_under_relabeling_and_order(data, seed):
    bnodes, quads = data
    try:
        canonical = urdna2015(quads)
    except CanonicalizationBudgetError:
        assume(False)
        return
    # bijective relabel with fresh names + shuffled quad order
    shuffled_names = list(bnodes)
    seed.shuffle(shuffled_names)
    mapping = {b: f"_:zz{j}" for j, b in enumerate(shuffled_names)}
    permuted = _relabel(quads, mapping)
    seed.shuffle(permuted)
    assert urdna2015(permuted) == canonical
    # canonical labels are c14n-prefixed (never leak input labels)
    assert "_:x" not in canonical and "_:zz" not in canonical


def test_preflight_rejects_bad_inputs(spark, tmp_path):
    from pyspark.sql import functions as F

    from gleaner_spark.plans.pipeline import PipelineConfig, run_pipeline
    from gleaner_spark.plans.preflight import PreflightError, preflight_checks
    from gleaner_spark.sources.pages import gen_pages_spark, gen_sources_spark

    good = gen_pages_spark(spark, 5, 1)
    out = str(tmp_path / "w")

    # missing html column
    with pytest.raises(PreflightError, match="html"):
        preflight_checks(good.drop("html"), None, out)
    # wrong html type
    with pytest.raises(PreflightError, match="binary"):
        preflight_checks(good.withColumn("html", F.lit("s")), None, out)
    # broken sources dim
    with pytest.raises(PreflightError, match="sources dim"):
        preflight_checks(good, gen_sources_spark(spark).drop("pid"), out)
    # unwritable output parent
    with pytest.raises(PreflightError, match="output|create"):
        preflight_checks(good, None, "/proc/nope/warehouse")

    # run_pipeline fails fast BEFORE creating the output dir
    import os

    with pytest.raises(PreflightError):
        run_pipeline(spark, good.drop("html"), None,
                     PipelineConfig(output_dir=out, run_id="pf"))
    assert not os.path.exists(out)
