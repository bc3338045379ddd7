"""Parallel symmetry breaking on graphs (operators/graph.py luby_mis and
jones_plassmann_coloring) vs hashlib referees, plus the structural
guarantees the algorithms are supposed to deliver by construction.
"""

from __future__ import annotations

import hashlib
import random
from collections import defaultdict

from omldm_spark.operators.graph import luby_mis


def _frames(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "id long")
    sym = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges],
        "src long, dst long")
    return nodes, sym


def _prio(r, v):
    return (hashlib.md5(f"mis|{r}|{v}".encode()).hexdigest()
            + str(v).rjust(12, "0"))


def _mis_referee(n_nodes, edges, rounds):
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    active = set(range(n_nodes))
    out = {}
    for r in range(1, rounds + 1):
        pr = {v: _prio(r, v) for v in active}
        win = {v for v in active
               if all(pr[v] < pr[u] for u in nbrs[v] if u in active)}
        dom = {u for v in win for u in nbrs[v] if u in active} - win
        for v in win:
            out[v] = ("in_mis", r)
        for v in dom:
            out[v] = ("dominated", r)
        active -= win | dom
    for v in range(n_nodes):
        out.setdefault(v, ("undecided", 0))
    return out


def _random_graph(seed, n, m):
    rng = random.Random(seed)
    return sorted({(min(a, b), max(a, b))
                   for a, b in ((rng.randrange(n), rng.randrange(n))
                                for _ in range(m)) if a != b})


def test_luby_mis_matches_hashlib_referee(spark):
    n = 60
    edges = _random_graph(11, n, 140)
    nodes, sym = _frames(spark, n, edges)
    for rounds in (1, 3):
        got = {r.id: (r.status, r.rnd)
               for r in luby_mis(nodes, sym, rounds).collect()}
        assert got == _mis_referee(n, edges, rounds)


def test_luby_mis_structural_guarantees(spark):
    # Independence: no edge inside the MIS.  Maximality on the decided
    # region: every dominated vertex has an in_mis neighbor decided no
    # later than it; an isolated vertex always lands in the MIS round 1.
    n = 50
    edges = _random_graph(23, n, 120) + [(47, 48)]  # ensure 49 isolated?
    edges = sorted(set(edges))
    nodes, sym = _frames(spark, n, edges)
    rows = luby_mis(nodes, sym, 4).collect()
    status = {r.id: r.status for r in rows}
    rnd = {r.id: r.rnd for r in rows}
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    mis = {v for v, s in status.items() if s == "in_mis"}
    for a, b in edges:
        assert not (a in mis and b in mis), (a, b)
    for v, s in status.items():
        if s == "dominated":
            assert any(status[u] == "in_mis" and rnd[u] == rnd[v]
                       for u in nbrs[v]), v
        if not nbrs[v]:
            assert s == "in_mis" and rnd[v] == 1, v


def test_luby_mis_converges_on_epsilon_graph(spark):
    # On the real substrate (sf0.001 embeddings, eps graph) 4 rounds must
    # decide the overwhelming majority — the O(log n) contract in practice.
    from omldm_spark.queries import QUERIES
    from tests.conftest import SF_DIR as sf_dir

    rows = QUERIES["mis_epsilon_luby"](spark, sf_dir).collect()
    n = len(rows)
    undecided = sum(1 for r in rows if r.status == "undecided")
    assert n >= 400
    assert undecided <= n * 0.02, (undecided, n)


# ---------------------------------------------------------------------------
# Jones-Plassmann coloring
# ---------------------------------------------------------------------------

from omldm_spark.operators.graph import jones_plassmann_coloring  # noqa: E402


def _jp_prio(v):
    return (hashlib.md5(f"jp|{v}".encode()).hexdigest()
            + str(v).rjust(12, "0"))


def _jp_referee(n_nodes, edges, rounds):
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    active = set(range(n_nodes))
    pr = {v: _jp_prio(v) for v in range(n_nodes)}
    out = {}
    for r in range(1, rounds + 1):
        win = {v for v in active
               if all(pr[v] < pr[u] for u in nbrs[v] if u in active)}
        for v in sorted(win):
            used = {out[u][0] for u in nbrs[v] if u in out}
            c = 0
            while c in used:
                c += 1
            out[v] = (c, r)
        active -= win
    for v in range(n_nodes):
        out.setdefault(v, (-1, 0))
    return out


def test_jp_coloring_matches_hashlib_referee(spark):
    n = 60
    edges = _random_graph(31, n, 140)
    nodes, sym = _frames(spark, n, edges)
    for rounds in (1, 4):
        got = {r.id: (r.color, r.rnd)
               for r in jones_plassmann_coloring(nodes, sym,
                                                 rounds).collect()}
        assert got == _jp_referee(n, edges, rounds)


def test_jp_coloring_structural_guarantees(spark):
    # Validity on the decided region: no edge joins two same-colored
    # vertices.  Greedy tightness: every colored vertex's color is the
    # mex of its EARLIER-or-same-round colored neighborhood, hence
    # <= its degree.  Isolated vertices get color 0 round 1.
    n = 50
    edges = sorted(set(_random_graph(41, n, 120)))
    nodes, sym = _frames(spark, n, edges)
    rows = jones_plassmann_coloring(nodes, sym, 5).collect()
    color = {r.id: r.color for r in rows}
    rnd = {r.id: r.rnd for r in rows}
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    for a, b in edges:
        if color[a] >= 0 and color[b] >= 0:
            assert color[a] != color[b], (a, b)
    for v in range(n):
        if color[v] >= 0:
            assert color[v] <= len(nbrs[v]), v
            used = {color[u] for u in nbrs[v]
                    if 0 <= rnd[u] < rnd[v] and color[u] >= 0}
            mex = 0
            while mex in used:
                mex += 1
            assert color[v] == mex, v
        if not nbrs[v]:
            assert color[v] == 0 and rnd[v] == 1, v


def test_jp_coloring_converges_on_epsilon_graph(spark):
    from omldm_spark.queries import QUERIES
    from tests.conftest import SF_DIR as sf_dir

    rows = QUERIES["jp_coloring_epsilon"](spark, sf_dir).collect()
    n = len(rows)
    undecided = sum(1 for r in rows if r.color < 0)
    assert n >= 400
    assert undecided <= n * 0.05, (undecided, n)
    # palette stays near-minimal for the eps graph's clique-ish cells
    assert max(r.color for r in rows) <= 40
