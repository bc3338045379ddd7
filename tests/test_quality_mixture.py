"""Quality-filter funnel (functions/text.py quality_funnel) and the
temperature source-mixture plan (queries.py source_mixture_plan) vs
pure-python referees on the real sf0.001 documents table, plus the
invariants each report must satisfy by construction.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb

from omldm_spark.functions.text import FUNNEL_RULES, quality_funnel
from omldm_spark.io import load_table
from tests.conftest import SF_DIR


def _docs_rows():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT doc_id, text, source FROM '{SF_DIR}/documents.parquet'"
    ).fetchall()
    con.close()
    return rows


def _toks(text):
    return [t for t in re.split(r"\s+", text.lower()) if t]


_STOP = {"the", "a", "of", "and", "to", "in", "is"}


def _funnel_referee(rows):
    feats = []
    for _, text, _ in rows:
        toks = _toks(text)
        nt = len(toks)
        sl = sum(len(t) for t in toks)
        ns = sum(1 for t in toks if t in _STOP)
        m = max(Counter(toks).values()) if toks else 0
        feats.append((nt, sl, ns, m))
    preds = [
        lambda f: f[0] >= 20,
        lambda f: f[0] <= 90,
        lambda f: 40 * f[0] <= f[1] * 10 <= 50 * f[0],
        lambda f: f[2] * 100 >= 3 * f[0],
        lambda f: f[3] * 10 <= f[0],
    ]
    out, survivors = [], feats
    for i, p in enumerate(preds, start=1):
        nxt = [f for f in survivors if p(f)]
        out.append((i, FUNNEL_RULES[i - 1][0], len(survivors),
                    len(survivors) - len(nxt), len(nxt)))
        survivors = nxt
    return out


def test_quality_funnel_matches_python_referee(spark):
    rows = _docs_rows()
    got = sorted(
        (r.rule_no, r.rule, r.n_in, r.n_killed, r.n_out)
        for r in quality_funnel(
            load_table(spark, SF_DIR, "documents")).collect())
    assert got == _funnel_referee(rows)


def test_quality_funnel_is_conservative(spark):
    # Chain invariants: n_in of rule 1 == corpus size; every row's
    # n_in == n_killed + n_out; n_in of rule i+1 == n_out of rule i;
    # every rule kills someone on this corpus (thresholds discriminate).
    rows = sorted(quality_funnel(
        load_table(spark, SF_DIR, "documents")).collect(),
        key=lambda r: r.rule_no)
    assert rows[0].n_in == len(_docs_rows())
    for r in rows:
        assert r.n_in == r.n_killed + r.n_out
        assert r.n_killed > 0
    for a, b in zip(rows, rows[1:]):
        assert b.n_in == a.n_out


def test_source_mixture_plan_matches_python_referee(spark):
    from omldm_spark.queries import QUERIES

    rows = _docs_rows()
    mass = Counter()
    docs = Counter()
    for _, text, source in rows:
        mass[source] += len(_toks(text))
        docs[source] += 1
    q = {s: math.floor(math.sqrt(n) * 1_000_000) for s, n in mass.items()}
    qs, toks = sum(q.values()), sum(mass.values())
    got = {r.source: r for r in QUERIES["source_mixture_plan"](
        spark, SF_DIR).collect()}
    assert set(got) == set(mass)
    for s in mass:
        r = got[s]
        share = q[s] * 1_000_000 // qs
        alloc = (2 * toks) * share // 1_000_000
        assert (r.n_docs, r.n_tokens, r.q_sqrt) == (docs[s], mass[s], q[s])
        assert r.share_ppm == share
        assert r.alloc_tokens == alloc
        assert r.epochs_ppm == alloc * 1_000_000 // mass[s]


def test_source_mixture_plan_tempers_toward_uniform(spark):
    # T=2 flattening: every source's share sits strictly between its
    # raw token share and the uniform share (unless already uniform),
    # and shares sum to <= 1e6 (truncation) within n_sources ppm.
    from omldm_spark.queries import QUERIES

    rows = QUERIES["source_mixture_plan"](spark, SF_DIR).collect()
    toks = sum(r.n_tokens for r in rows)
    uniform = 1_000_000 // len(rows)
    total_share = sum(r.share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= total_share <= 1_000_000
    for r in rows:
        raw = r.n_tokens * 1_000_000 // toks
        lo, hi = sorted((raw, uniform))
        assert lo - 1 <= r.share_ppm <= hi + 1, (r.source, raw, r.share_ppm)


# ---------------------------------------------------------------------------
# LSH banding calibration (operators/dedup.py lsh_pr_calibration)
# ---------------------------------------------------------------------------

def test_lsh_pr_calibration_s_curve_invariants(spark):
    # Finer banding can only ADD candidates (matching a coarse band
    # implies matching every sub-band), so n_candidates and recall are
    # nondecreasing in bands and fn is nonincreasing; counts are
    # mutually consistent; at bands == k (rows-per-band 1) recall is
    # maximal for the sweep.
    from omldm_spark.queries import QUERIES

    rows = sorted(QUERIES["minhash_pr_calibration"](spark, SF_DIR).collect(),
                  key=lambda r: r.bands)
    assert [r.bands for r in rows] == [1, 2, 4, 8]
    nt = rows[0].n_truth
    assert nt > 0
    for r in rows:
        assert r.n_truth == nt
        assert r.tp <= min(r.n_candidates, r.n_truth)
        assert r.fp == r.n_candidates - r.tp
        assert r.fn == r.n_truth - r.tp
        if r.n_candidates:
            assert r.precision_ppm == r.tp * 1_000_000 // r.n_candidates
        assert r.recall_ppm == r.tp * 1_000_000 // nt
    for a, b in zip(rows, rows[1:]):
        assert b.n_candidates >= a.n_candidates
        assert b.recall_ppm >= a.recall_ppm
        assert b.fn <= a.fn
    assert rows[-1].recall_ppm == max(r.recall_ppm for r in rows)


def test_lsh_pr_calibration_planted_pair(spark):
    # A planted near-dup pair must be truth AND a candidate at the
    # permissive end (bands=8); an unrelated doc pair must be neither.
    from omldm_spark.operators.dedup import lsh_pr_calibration

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail"),
         (3, "completely different words about spark catalyst plans"),
         (4, "unrelated text mentioning parquet shuffles and joins")],
        "doc_id long, text string")
    rows = {r.bands: r for r in lsh_pr_calibration(docs).collect()}
    assert rows[8].n_truth == 1          # only the planted pair
    assert rows[8].tp == 1               # rows-per-band 1 catches it
    assert rows[1].n_candidates <= rows[8].n_candidates


# ---------------------------------------------------------------------------
# Hard-negative mining + shuffle-skew diagnostic
# ---------------------------------------------------------------------------

def test_hard_negative_topk_excludes_same_label(spark):
    from omldm_spark.queries import QUERIES

    rows = QUERIES["hard_negative_topk"](spark, SF_DIR).collect()
    assert rows
    per_q = Counter(r.query_id for r in rows)
    for r in rows:
        assert r.neighbor_label != r.query_label
        assert 1 <= r.rank <= 5
    assert all(v == 5 for v in per_q.values())


def test_hard_negative_topk_is_cross_label_slice_of_brute_force(spark):
    # The hard negatives are exactly the top-5 of the FULL neighbor
    # ranking restricted to cross-label rows (same scores, same
    # tie-break) — mining never invents or re-scores a neighbor.
    from omldm_spark.operators.similarity import (cosine_topk,
                                                  hard_negative_topk)
    from omldm_spark.io import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    full = cosine_topk(emb, k=10_000, max_query_id=3).collect()
    expect = {}
    for r in sorted(full, key=lambda r: (r.query_id, r.rank)):
        if labels[r.neighbor_id] != labels[r.query_id]:
            lst = expect.setdefault(r.query_id, [])
            if len(lst) < 5:
                lst.append((r.neighbor_id, r.cos_sim))
    got = {}
    for r in sorted(hard_negative_topk(emb, k=5, max_query_id=3).collect(),
                    key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append((r.neighbor_id, r.cos_sim))
    assert got == expect


def test_shuffle_skew_report_flags_planted_hot_key(spark):
    # Referee on a planted 50%-hot-key table: the ratio math must flag
    # it; a uniform key must not be flagged.
    import pyspark.sql.functions as F
    from omldm_spark.queries import _SKEW_KEYS, QUERIES

    rows = {(r.fact_table, r.key_col): r
            for r in QUERIES["shuffle_skew_report"](spark, SF_DIR).collect()}
    assert set(rows) == {(t, c) for t, cs in _SKEW_KEYS.items() for c in cs}
    for r in rows.values():
        assert r.max_key_rows <= r.n_rows
        assert r.top_share_ppm == r.max_key_rows * 1_000_000 // r.n_rows
        assert (r.skew_ratio_ppm
                == r.max_key_rows * r.n_keys * 1_000_000 // r.n_rows)
        assert r.salting_recommended == (r.skew_ratio_ppm > 4_000_000)
        assert r.skew_ratio_ppm >= 1_000_000 - r.n_keys  # max >= mean
    # planted: 100 rows, one key owns 60, 40 spread over 40 keys
    import omldm_spark.queries as qmod
    planted = spark.createDataFrame(
        [(0, 777)] * 60 + [(i, i) for i in range(1, 41)],
        "user_id long, event_type long")
    u = planted.selectExpr(
        "stack(1, 'user_id', CAST(user_id AS STRING)) AS (key_col, key_val)")
    g = u.groupBy("key_col", "key_val").agg(F.count(F.lit(1)).alias("c"))
    agg = g.groupBy("key_col").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("k"),
        F.max("c").alias("m")).collect()[0]
    ratio = agg.m * agg.k * 1_000_000 // agg.n
    assert ratio > 4_000_000  # 60/100 hot over 41 keys -> ~24.6x mean


def test_funnel_counters_are_additive(spark):
    # The IVM property the streaming twin rides: counters over any
    # partition of the corpus sum to the whole-corpus counters.
    import pyspark.sql.functions as F
    from omldm_spark.functions.text import funnel_counters

    docs = load_table(spark, SF_DIR, "documents")
    whole = funnel_counters(docs).collect()[0]
    parts = [funnel_counters(docs.filter(F.col("doc_id") % 3 == i))
             for i in range(3)]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    summed = u.agg(*[F.sum(f"s{i}").cast("long").alias(f"s{i}")
                     for i in range(6)]).collect()[0]
    assert tuple(summed) == tuple(whole)


def test_itemknn_recommendations_python_referee(spark):
    # Full referee: Jaccard item sims (support >= 2) and summed-sim
    # scoring over unseen items, top-5 with (score desc, item) order.
    from itertools import combinations
    from omldm_spark.queries import QUERIES

    con = duckdb.connect()
    ui = set(con.execute(
        f"""SELECT DISTINCT user_id,
                   CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT)
            FROM '{SF_DIR}/events.parquet'""").fetchall())
    con.close()
    by_user, by_item = {}, {}
    for u, i in ui:
        by_user.setdefault(u, set()).add(i)
        by_item.setdefault(i, set()).add(u)
    sim = {}
    for a, b in combinations(sorted(by_item), 2):
        co = len(by_item[a] & by_item[b])
        if co >= 2:
            s = co * 1_000_000 // (len(by_item[a]) + len(by_item[b]) - co)
            sim[(a, b)] = sim[(b, a)] = s
    expect = {}
    for u in by_user:
        if u >= 30:
            continue
        scores = {}
        for j in by_user[u]:
            for (src, dst), s in ((k, v) for k, v in sim.items()
                                  if k[0] == j):
                if dst not in by_user[u]:
                    e = scores.setdefault(dst, [0, 0])
                    e[0] += s
                    e[1] += 1
        top = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:5]
        for r, (item, (sc, ns)) in enumerate(top, start=1):
            expect[(u, item)] = (sc, ns, r)
    got = {(r.user_id, r.item): (r.score, r.n_src, r.rank)
           for r in QUERIES["itemknn_recommendations"](spark,
                                                       SF_DIR).collect()}
    assert got == expect
    # never recommend something already in the history
    for (u, item) in got:
        assert item not in by_user[u]
