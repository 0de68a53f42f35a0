"""Conformance-grade URDNA2015 validation against an INDEPENDENT
canonicalizer.

The public W3C rdf-canon test vectors are not vendorable in this
offline sandbox, so this module builds the next-strongest check: a
brute-force canonical labeling (lexicographic minimum over ALL
blank-node label permutations — the mathematical definition of a
canonical form, tractable for ≤ 7 bnodes) and asserts that
``core.jsonld.urdna2015`` induces EXACTLY the same isomorphism classes:

    urdna2015(G1) == urdna2015(G2)  ⟺  brute_canonical(G1) == brute_canonical(G2)

over the adversarial families where canonicalizers break — automorphic
cycles (where first-degree hashes all tie and the N-degree path must
disambiguate), the C3+C3 vs C6 classic (equal node/edge/degree
multisets, non-isomorphic), complete bipartite graphs, and mirrored
trees — plus randomized graphs with single-edge mutations.

The two serializations differ byte-wise (only equality CLASSES are
compared), so this checks the algorithm, not itself.
"""

from __future__ import annotations

from itertools import permutations

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from gleaner_spark.core.jsonld import (
    CanonicalizationBudgetError,
    Quad,
    RdfTerm,
    urdna2015,
)

P = "http://p/e"
P2 = "http://p/f"


def _term(t: RdfTerm | None, labels: dict[str, str]) -> str:
    if t is None:
        return ""
    if t.kind == "blank":
        return labels[t.value]
    if t.kind == "iri":
        return f"<{t.value}>"
    out = f'"{t.value}"'
    if t.datatype:
        out += f"^^<{t.datatype}>"
    return out


def brute_canonical(quads: list[Quad]) -> str:
    """Lexicographic minimum over all bnode label permutations of the
    sorted serialization — an algorithm-independent canonical form."""
    bnodes = sorted({
        t.value
        for q in quads
        for t in (q.s, q.o, q.g)
        if t is not None and t.kind == "blank"
    })
    assert len(bnodes) <= 7, "brute force bounded to 7 bnodes"
    if not bnodes:
        perms = [()]
    else:
        perms = permutations(range(len(bnodes)))
    best = None
    for perm in perms:
        labels = {b: f"_:k{perm[i]}" for i, b in enumerate(bnodes)}
        lines = sorted(
            f"{_term(q.s, labels)} {_term(q.p, labels)} "
            f"{_term(q.o, labels)} {_term(q.g, labels)}".rstrip() + " ."
            for q in quads
        )
        cand = "\n".join(lines)
        if best is None or cand < best:
            best = cand
    return best or ""


def b(name: str) -> RdfTerm:
    return RdfTerm("blank", name)


def iri(v: str) -> RdfTerm:
    return RdfTerm("iri", v)


def lit(v: str) -> RdfTerm:
    return RdfTerm("literal", v)


def edge(s: RdfTerm, o: RdfTerm, p: str = P) -> Quad:
    return Quad(s, iri(p), o, None)


def cycle(n: int, prefix: str = "c") -> list[Quad]:
    return [
        edge(b(f"_:{prefix}{i}"), b(f"_:{prefix}{(i + 1) % n}"))
        for i in range(n)
    ]


def _classes_agree(g1: list[Quad], g2: list[Quad]) -> None:
    iso_brute = brute_canonical(g1) == brute_canonical(g2)
    iso_urdna = urdna2015(g1) == urdna2015(g2)
    assert iso_urdna == iso_brute, (
        f"urdna2015 {'merged' if iso_urdna else 'split'} graphs the "
        f"brute-force canonical form {'splits' if iso_urdna else 'merges'}"
    )


class TestAutomorphicFamilies:
    def test_cycles_isomorphic_under_rotation(self):
        for n in range(2, 7):
            g1 = cycle(n, "a")
            # same cycle, nodes named in rotated/reversed order
            g2 = [
                edge(b(f"_:z{(i + 3) % n}"), b(f"_:z{(i + 4) % n}"))
                for i in range(n)
            ]
            _classes_agree(g1, g2)
            assert urdna2015(g1) == urdna2015(g2)

    def test_c3_plus_c3_differs_from_c6(self):
        """Equal node count, edge count, and degree multiset — only the
        global structure differs.  First-degree hashing cannot split
        these; the N-degree path must."""
        g1 = cycle(3, "a") + cycle(3, "b")
        g2 = cycle(6, "c")
        _classes_agree(g1, g2)
        assert urdna2015(g1) != urdna2015(g2)

    def test_ndegree_budget_boundary_is_the_ambiguous_group_size(self):
        """The n-degree budget keys on the size of the largest group of
        first-degree-indistinguishable bnodes (cap 6): six automorphic
        cycle nodes canonicalize (C6, C3+C3 above), while EIGHT — one
        C8 or two disjoint C4s, whose nodes all share a first-degree
        hash — raise CanonicalizationBudgetError so the pipeline takes
        the filesha fallback instead of burning factorial time."""
        import pytest

        with pytest.raises(CanonicalizationBudgetError):
            urdna2015([
                edge(b(f"_:c{i}"), b(f"_:c{(i + 1) % 8}")) for i in range(8)
            ])
        with pytest.raises(CanonicalizationBudgetError):
            urdna2015(cycle(4, "a") + cycle(4, "b"))

    def test_complete_bipartite_k23(self):
        def k23(pre):
            return [
                edge(b(f"_:{pre}l{i}"), b(f"_:{pre}r{j}"))
                for i in range(2) for j in range(3)
            ]

        _classes_agree(k23("a"), k23("z"))
        assert urdna2015(k23("a")) == urdna2015(k23("z"))
        # K_{2,3} vs K_{3,2} with edges REVERSED is a different digraph
        rev = [
            edge(b(f"_:r{j}"), b(f"_:l{i}"))
            for i in range(2) for j in range(3)
        ]
        _classes_agree(k23("a"), rev)

    def test_mirrored_tree_automorphism(self):
        def tree(pre):
            root, l, r = b(f"_:{pre}root"), b(f"_:{pre}l"), b(f"_:{pre}r")
            ll, rr = b(f"_:{pre}ll"), b(f"_:{pre}rr")
            return [
                edge(root, l), edge(root, r),
                edge(l, ll), edge(r, rr),
            ]

        _classes_agree(tree("a"), tree("z"))
        # attach a literal to ONE leaf vs the OTHER leaf: isomorphic
        # (mirror symmetry); to BOTH: a different class
        one = tree("a") + [edge(b("_:all"), lit("v"), P2)]
        other = tree("a") + [edge(b("_:arr"), lit("v"), P2)]
        both = tree("a") + [edge(b("_:all"), lit("v"), P2),
                            edge(b("_:arr"), lit("v"), P2)]
        _classes_agree(one, other)
        _classes_agree(one, both)
        assert urdna2015(one) == urdna2015(other)
        assert urdna2015(one) != urdna2015(both)

    def test_cycle_with_distinguishing_literal(self):
        base = cycle(4, "a")
        g1 = base + [edge(b("_:a0"), lit("mark"), P2)]
        g2 = base + [edge(b("_:a2"), lit("mark"), P2)]  # rotation → iso
        g3 = base + [edge(b("_:a0"), lit("mark"), P2),
                     edge(b("_:a1"), lit("mark"), P2)]  # adjacent pair
        g4 = base + [edge(b("_:a0"), lit("mark"), P2),
                     edge(b("_:a2"), lit("mark"), P2)]  # opposite pair
        _classes_agree(g1, g2)
        _classes_agree(g3, g4)
        assert urdna2015(g1) == urdna2015(g2)
        assert urdna2015(g3) != urdna2015(g4)


@st.composite
def small_bnode_graphs(draw):
    n = draw(st.integers(min_value=2, max_value=5))
    nodes = [f"_:n{i}" for i in range(n)]
    n_edges = draw(st.integers(min_value=1, max_value=8))
    edges = [
        (draw(st.sampled_from(nodes)), draw(st.sampled_from([P, P2])),
         draw(st.sampled_from(nodes)))
        for _ in range(n_edges)
    ]
    return nodes, sorted(set(edges))


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=small_bnode_graphs(), seed=st.randoms(use_true_random=False))
def test_urdna_matches_bruteforce_classes_under_mutation(data, seed):
    """Random graph + random single-edge mutation: urdna2015 must agree
    with the brute-force canonical form on whether the mutant is still
    isomorphic to the original."""
    nodes, edges = data
    g1 = [edge(b(s), b(o), p) for s, p, o in edges]
    # mutate: rewire one edge endpoint (may or may not change the class)
    es = list(edges)
    i = seed.randrange(len(es))
    s, p, o = es[i]
    es[i] = (s, p, seed.choice(nodes))
    g2 = [edge(b(s2), b(o2), p2) for s2, p2, o2 in sorted(set(es))]
    try:
        _classes_agree(g1, g2)
    except CanonicalizationBudgetError:
        assume(False)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(data=small_bnode_graphs(), seed=st.randoms(use_true_random=False))
def test_urdna_equals_relabeled_bruteforce_always(data, seed):
    """Random graph, random relabeling: both canonicalizers must call
    the pair isomorphic (and urdna's canonical bytes must be identical,
    not merely same-class)."""
    nodes, edges = data
    g1 = [edge(b(s), b(o), p) for s, p, o in edges]
    shuffled = list(nodes)
    seed.shuffle(shuffled)
    mapping = dict(zip(nodes, shuffled))
    g2 = [edge(b(mapping[s]), b(mapping[o]), p) for s, p, o in edges]
    seed.shuffle(g2)
    try:
        assert urdna2015(g1) == urdna2015(g2)
        assert brute_canonical(g1) == brute_canonical(g2)
    except CanonicalizationBudgetError:
        assume(False)
