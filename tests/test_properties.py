"""Property-based tests (hypothesis) for the engine's algebraic invariants
(SURVEY.md §5 strategy: property tests over the deterministic pieces).

These run on numpy/pure-python kernels — no Spark session — so hypothesis
can explore hundreds of cases cheaply.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from omldm_spark.learners import get_learner

finite_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@st.composite
def dataset(draw, dim=3, min_rows=2, max_rows=40):
    n = draw(st.integers(min_rows, max_rows))
    X = np.array(
        [[draw(finite_floats) for _ in range(dim)] for _ in range(n)]
    )
    y = np.array([draw(st.sampled_from([-1.0, 1.0])) for _ in range(n)])
    return X, y


@given(dataset())
@settings(max_examples=50, deadline=None)
def test_pa_merge_is_weighted_mean(data):
    """merge([a, b]) weights by n for every flat learner state."""
    X, y = data
    ln = get_learner("PA")
    hyper = {"C": 0.5}
    half = len(X) // 2
    if half == 0:
        return
    a = ln.partial_fit(X[:half], y[:half], ln.init_state(3, hyper), hyper)
    b = ln.partial_fit(X[half:], y[half:], ln.init_state(3, hyper), hyper)
    m = ln.merge([a, b])
    na, nb = a["n"], b["n"]
    expected = (a["w"] * na + b["w"] * nb) / (na + nb)
    assert np.allclose(m["w"], expected)
    assert m["n"] == na + nb


@given(dataset())
@settings(max_examples=50, deadline=None)
def test_sequential_fit_is_batch_concat(data):
    """partial_fit(X1) then partial_fit(X2) == partial_fit(X1 ++ X2) —
    the property that makes per-partition sequential passes well-defined."""
    X, y = data
    ln = get_learner("PA")
    hyper = {"C": 0.5}
    half = len(X) // 2
    s_two = ln.partial_fit(
        X[half:], y[half:],
        ln.partial_fit(X[:half], y[:half], ln.init_state(3, hyper), hyper),
        hyper,
    )
    s_one = ln.partial_fit(X, y, ln.init_state(3, hyper), hyper)
    assert np.allclose(s_two["w"], s_one["w"])
    assert s_two["n"] == s_one["n"]


@given(dataset(dim=2))
@settings(max_examples=50, deadline=None)
def test_kmeans_merge_preserves_mass(data):
    """Count-weighted centroid merge preserves the total weighted sum."""
    X, _ = data
    ln = get_learner("K-means")
    hyper = {"k": 2}
    half = len(X) // 2
    if half < 2:
        return
    a = ln.partial_fit(X[:half], None, ln.init_state(2, hyper), hyper)
    b = ln.partial_fit(X[half:], None, ln.init_state(2, hyper), hyper)
    m = ln.merge([a, b])
    mass_in = (a["centroids"] * a["counts"][:, None]).sum(axis=0) + (
        b["centroids"] * b["counts"][:, None]
    ).sum(axis=0)
    mass_out = (m["centroids"] * m["counts"][:, None]).sum(axis=0)
    assert np.allclose(mass_in, mass_out, rtol=1e-9, atol=1e-6)


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=200),
       st.integers(1, 16))
@settings(max_examples=100, deadline=None)
def test_split_slots_are_80_20(ids, workers):
    """The slot rule ((rn-1) % 10 >= 8) puts exactly floor/ceil 20% of every
    worker's rows in test slots — pure-python mirror of the SQL."""
    per_worker: dict[int, int] = {}
    for i in sorted(set(ids)):
        w = i % workers
        per_worker[w] = per_worker.get(w, 0) + 1
    for w, n in per_worker.items():
        test_slots = sum(1 for rn in range(1, n + 1) if (rn - 1) % 10 >= 8)
        assert abs(test_slots - 0.2 * n) <= 2  # boundary rows of the last 10


@given(st.lists(st.floats(-1e9, 1e9, allow_nan=False), max_size=120),
       st.integers(1, 50))
@settings(max_examples=100, deadline=None)
def test_chunk_layout_roundtrip(values, bucket):
    """Pure-python mirror of functions/chunking.py layout math: slicing into
    buckets and re-concatenating in bucket order is the identity."""
    buckets = [values[i:i + bucket] for i in range(0, max(len(values), 1), bucket)]
    assert [v for b in buckets for v in b] == values
