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


@st.composite
def spd_system(draw, d):
    rows = [[draw(finite_floats) for _ in range(d + 1)] for _ in range(d + 1)]
    A = np.array(rows) / 1e3
    A = A @ A.T + (d + 1) * np.eye(d + 1)
    b = np.array([draw(finite_floats) for _ in range(d + 1)]) / 1e3
    return A, b


@settings(max_examples=40, deadline=None)
@given(st.integers(2, 3).flatmap(lambda d: st.tuples(st.just(d), spd_system(d))))
def test_cramer_sql_solves_random_spd_systems(arg):
    """The generated shared-Cramer text solves (A + lam I_aug) w = b for any
    well-conditioned system, matching numpy to rounding tolerance."""
    import duckdb

    from omldm_spark.learners.orr import cramer_sql

    d, (A, b) = arg
    lam = 0.1
    cols, vals = [], []
    for i in range(d):
        for j in range(i, d):
            cols.append(f"m_{i}_{j}"); vals.append(A[i, j])
        cols.append(f"m_{i}_b"); vals.append(A[i, d])
        cols.append(f"v_{i}"); vals.append(b[i])
    cols += ["v_b", "n"]; vals += [b[d], 10]
    rel = "SELECT " + ", ".join(
        f"CAST({v!r} AS DOUBLE) AS {c}" for c, v in zip(cols, vals)
    )
    out = duckdb.connect().execute(
        cramer_sql(d).format(g=f"({rel})", lam=lam)
    ).fetchdf()
    A2 = A.copy()
    A2[d, d] = 1.0
    w = np.linalg.solve(A2 + lam * np.eye(d + 1), b)
    got = np.array([out[f"w{k}"][0] for k in range(d)] + [out["bias"][0]])
    assert np.allclose(got, w, atol=1e-4, rtol=1e-4)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(-50, 50), st.booleans()),
                min_size=2, max_size=60))
def test_auc_histogram_identity(pairs):
    """The histogram AUC formula (operators/evaluation.py) equals the
    pairwise definition P(s+ > s-) + P(s+ = s-)/2 on any integer-score
    multiset with both classes present."""
    if not any(l for _, l in pairs) or all(l for _, l in pairs):
        return
    from collections import Counter

    np_c = Counter(s for s, l in pairs if l)
    nn_c = Counter(s for s, l in pairs if not l)
    scores = sorted(set(np_c) | set(nn_c))
    cum_nn = 0
    num2 = 0
    for s in scores:
        nn_lt = cum_nn
        num2 += np_c[s] * (2 * nn_lt + nn_c[s])
        cum_nn += nn_c[s]
    npos, nneg = sum(np_c.values()), sum(nn_c.values())
    hist_auc = num2 / (2 * npos * nneg)

    pos = [s for s, l in pairs if l]
    neg = [s for s, l in pairs if not l]
    ref = sum(1.0 if p > n else (0.5 if p == n else 0.0)
              for p in pos for n in neg) / (npos * nneg)
    assert abs(hist_auc - ref) < 1e-12


def test_seasonal_decompose_matches_python_referee(spark):
    # full python reconstruction of the decomposition from the raw daily
    # series (duckdb-derived), with TRUNCATING division — python's
    # flooring // diverges on negative detrended sums (NOTES r6), so the
    # referee uses int() truncation explicitly.
    import duckdb

    from omldm_spark.queries import QUERIES
    from tests.conftest import SF_DIR

    daily = duckdb.sql(f"""
        SELECT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS d,
               CAST(CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                    // 100 AS BIGINT) AS y
        FROM '{SF_DIR}/events.parquet'
        WHERE event_type = 'purchase' GROUP BY 1 ORDER BY 1
    """).fetchall()
    ds = [d for d, _ in daily]
    ys = [y for _, y in daily]

    def tdiv(a, b):
        return int(a / b) if a * b >= 0 else -(abs(a) // abs(b))

    trend = {}
    for i in range(len(ys)):
        if 3 <= i < len(ys) - 3:
            trend[ds[i]] = sum(ys[i - 3:i + 4]) // 7  # positive: floor==trunc
    from collections import defaultdict
    acc = defaultdict(lambda: [0, 0])
    for i, d in enumerate(ds):
        if d in trend:
            acc[d % 7][0] += ys[i] - trend[d]
            acc[d % 7][1] += 1
    seasonal = {dow: tdiv(s, n) for dow, (s, n) in acc.items()}
    want = {}
    for i, d in enumerate(ds):
        t = trend.get(d)
        s = seasonal[d % 7]
        want[d] = (ys[i], t, d % 7, s,
                   ys[i] - t - s if t is not None else None)
    got = {r.day: (r.y, r.trend, r.dow, r.seasonal, r.resid)
           for r in QUERIES["seasonal_decompose_daily"](
               spark, SF_DIR).collect()}
    assert got == want
    # at least one detrended DOW sum is negative at this SF, so the
    # trunc-vs-floor distinction is actually exercised
    assert any(s < 0 for s, _ in acc.values())
    # reconstruction identity wherever trend exists
    assert all(y == t + s + r for (y, t, _, s, r) in got.values()
               if t is not None for r in [y - t - s])


def test_burstiness_closed_forms(spark):
    # clockwork gaps -> B = -1 exactly; a heavy burst + long silence
    # drives B positive; python referee over the shared moment formula.
    import math

    from pyspark.sql import functions as F
    from omldm_spark.queries import QUERIES  # noqa: F401  (query is gated)

    def burst(gaps):
        n = len(gaps)
        s1, s2 = sum(gaps), sum(g * g for g in gaps)
        d = n * s2 - s1 * s1
        if not (s1 > 0 or d > 0):
            return None
        return math.floor((math.sqrt(d) - s1) / (math.sqrt(d) + s1)
                          * 1e6 + 0.5)

    assert burst([60] * 10) == -1_000_000
    assert burst([1, 1, 1, 1, 10000]) > 300_000
    assert burst([0, 0, 0]) is None

    # and the Spark expression agrees with the referee on planted rows
    rows = [(1, t, i) for i, t in enumerate([0, 60, 120, 180])] + \
           [(2, t, 100 + i) for i, t in enumerate([0, 1, 2, 3, 10003])]
    df = spark.createDataFrame(rows, "user_id long, ts_s long, event_id long")
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    g = df.withColumn("gap", F.col("ts_s") - F.lag("ts_s").over(w))
    st = g.filter(F.col("gap").isNotNull()).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"))
    from omldm_spark.queries import _BURST_PPM
    out = {r.user_id: r.b for r in st.select(
        "user_id", F.expr(_BURST_PPM).alias("b")).collect()}
    assert out[1] == -1_000_000
    assert out[2] == burst([1, 1, 1, 10000])


def test_powerlaw_alpha_referee_on_planted_tail(spark):
    # planted pareto-ish counts with known MLE: alpha = 1 + n/sum(ln(d/dmin))
    # under the shared ppm quantization; also pins the dmin cut.
    import math

    from pyspark.sql import functions as F
    from omldm_spark.queries import _PL_DMIN, _PL_LN_PPM

    counts = [5, 5, 6, 8, 10, 20, 50, 400, 3]   # 3 is below dmin=5
    df = spark.createDataFrame([(c,) for c in counts], "d long")
    tail = df.filter(F.col("d") >= _PL_DMIN).select(
        "d", F.expr(_PL_LN_PPM).alias("ln_ppm"))
    got = tail.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ln_ppm").alias("s"),
    ).collect()[0]
    want_n = sum(1 for c in counts if c >= _PL_DMIN)
    want_s = sum(math.floor(math.log(c / _PL_DMIN) * 1e6 + 0.5)
                 for c in counts if c >= _PL_DMIN)
    assert (got.n, got.s) == (want_n, want_s)
    alpha_ppm = 1_000_000 + got.n * 10**12 // got.s
    assert 1_500_000 < alpha_ppm < 3_500_000   # plausible tail exponent


# ---------------------------------------------------------------------------
# Round-12 invariants: chain suppression, ChiMerge exact predicate, bloom
# bit-array <-> bucket-set identity (all pure-python referees of logic the
# operators/oracles rely on)
# ---------------------------------------------------------------------------

def _suppress(raw: dict) -> dict:
    """The louvain merge-pass chain suppression exactly as implemented
    (graph.py _community_merge_pass / its referee tests)."""
    return {c: (d if raw.get(d, d) == d else c) for c, d in raw.items()}


@st.composite
def minward_moves(draw):
    """A random min-ward raw move map: each community maps to itself or
    a strictly smaller id (the only shapes the argmax can emit)."""
    n = draw(st.integers(1, 40))
    ids = sorted(draw(st.sets(st.integers(0, 200), min_size=n, max_size=n)))
    raw = {}
    for i, c in enumerate(ids):
        if i > 0 and draw(st.booleans()):
            raw[c] = draw(st.sampled_from(ids[:i]))
        else:
            raw[c] = c
    return raw


@given(minward_moves())
@settings(max_examples=200, deadline=None)
def test_chain_suppression_properties(raw):
    out = _suppress(raw)
    # same keys, and each value is either the raw target or a revert
    assert out.keys() == raw.keys()
    for c, d in out.items():
        assert d in (raw[c], c)
    # every moved-to label is a FIXPOINT of the suppressed map
    for c, d in out.items():
        if d != c:
            assert out.get(d, d) == d, (c, d)
    # idempotent: suppressing an already-suppressed map changes nothing
    assert _suppress(out) == out


@given(st.tuples(st.integers(0, 8_000_000), st.integers(0, 8_000_000),
                 st.integers(0, 8_000_000), st.integers(0, 8_000_000)))
@settings(max_examples=300, deadline=None)
def test_chimerge_integer_predicate_matches_exact_rational(counts):
    """The never-divides integer comparison 1000*N*det^2 < 2706*R must
    equal the exact rational chi2 < 2.706 test on every in-envelope
    bin pair (fractions.Fraction referee — no float roundoff)."""
    from fractions import Fraction

    a1, b1, a2, b2 = counts
    r1, r2 = a1 + b1, a2 + b2
    c1, c2 = a1 + a2, b1 + b2
    n = r1 + r2
    if r1 == 0 or r2 == 0:
        return  # an empty bin never forms an adjacent pair
    det = a1 * b2 - a2 * b1
    lhs = 1000 * n * det * det
    rhs = 2706 * r1 * r2 * c1 * c2
    int_pred = (c1 == 0 or c2 == 0 or lhs < rhs)
    if c1 == 0 or c2 == 0:
        exact_pred = True  # chi2 = 0 exactly
    else:
        chi2 = Fraction(n * det * det, r1 * r2 * c1 * c2)
        exact_pred = chi2 < Fraction(2706, 1000)
    assert int_pred == exact_pred
    # and the in-envelope LHS stays inside DECIMAL(38,0)/HUGEINT
    assert lhs < 10**38


@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=60,
                unique=True),
       st.lists(st.integers(0, 10**9), min_size=1, max_size=60))
@settings(max_examples=150, deadline=None)
def test_bloom_words_membership_equals_bucket_set(dim_keys, probe_keys):
    """The identity BLOOM_PRUNING_SQL's oracle rests on: membership in
    the bits/64 BIGINT word array (the Spark build) is EXACTLY
    membership of all k buckets in the SET of occupied buckets (the
    SQL reformulation) — for any dim-key set and probe keys, same
    md5-fold bucket function as sketch.bucket_sql."""
    import hashlib

    bits, k = 1024, 2

    def bucket(key: int, d: int) -> int:
        h = hashlib.md5(f"{d}|{key}".encode()).hexdigest()
        return int(h[:6], 16) % bits

    words = [0] * (bits // 64)
    occupied = set()
    for dk in dim_keys:
        for d in range(k):
            b = bucket(dk, d)
            occupied.add(b)
            words[b // 64] |= 1 << (b % 64)
    for pk in probe_keys:
        via_words = all(
            words[bucket(pk, d) // 64] & (1 << (bucket(pk, d) % 64))
            for d in range(k))
        via_set = all(bucket(pk, d) in occupied for d in range(k))
        assert via_words == via_set
        if pk in dim_keys:
            assert via_words  # no false negatives, ever


@given(
    st.lists(st.integers(1, 10**9), min_size=1, max_size=30),
    st.integers(0, 10**12),
    st.integers(1, 8),
)
@settings(max_examples=300, deadline=None)
def test_unimax_water_filling_closed_form_equals_sequential(sizes, budget, cap):
    """The identity unimax_mixture_plan rests on: the window-function
    closed form (capped prefix = maximal prefix with
    cap*n_i*(k-i+1) <= B - cap*S_{i-1}; uncapped split leftover
    evenly, floor, remainder to the largest) equals UniMax's published
    smallest-first sequential loop in exact Fraction arithmetic — for
    ANY source sizes, budget, and epoch cap.  This is the algebraic
    fact the Spark referee test samples at five budgets; here
    hypothesis sweeps the space (including the all-capped and
    zero-budget regimes)."""
    from fractions import Fraction

    order = sorted(range(len(sizes)), key=lambda i: (sizes[i], i))
    ns = [sizes[i] for i in order]
    k = len(ns)

    # sequential loop (the paper's algorithm), exact arithmetic
    rem = Fraction(budget)
    seq_capped = []
    for i, n in enumerate(ns):
        fair = rem / (k - i)
        if Fraction(cap * n) <= fair:
            seq_capped.append(True)
            rem -= cap * n
        else:
            seq_capped.append(False)
            rem -= fair

    # closed form (the operator's window math)
    t, s_prev, s_t, prefix_ok = 0, 0, 0, True
    cf_capped = []
    for i, n in enumerate(ns, 1):
        cap_ok = cap * n * (k - i + 1) <= budget - cap * s_prev
        cf_capped.append(prefix_ok and cap_ok)
        if prefix_ok and cap_ok:
            t, s_t = i, s_prev + n
        else:
            prefix_ok = False
        s_prev += n

    # the capped prefix must be exactly the sequential capped set
    # (water-filling monotonicity: once uncapped, always uncapped)
    assert cf_capped == seq_capped

    # allocations: capped get cap*n; uncapped get the even floor split
    # with the remainder on the largest — and the total spends the
    # budget exactly whenever anything is uncapped
    if t < k:
        leftover = budget - cap * s_t
        assert leftover >= 0
        q, r = divmod(leftover, k - t)
        allocs = [cap * n for n in ns[:t]] + [q] * (k - t)
        allocs[-1] += r
        assert sum(allocs) == budget
        # every uncapped fair share is what the sequential loop gave,
        # up to the integer floor convention
        seq_fair = Fraction(leftover, k - t)
        for a in allocs[t:-1]:
            assert a == int(seq_fair // 1)
    else:
        assert sum(cap * n for n in ns) <= budget or k == 0
