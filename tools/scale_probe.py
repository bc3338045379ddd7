"""Cross-SF scaling probe: measured evidence for "would this survive a
100x scale-up?".

Runs every bench HEADLINE query at sf0.001 / sf0.01 / sf0.1 (a 100x
data-volume span) on the same session and reports, per query, the
runtimes and the large-step scaling factor t(sf0.1)/t(sf0.01) against
the 10x data growth.  A factor well under 10 means the runtime is
dominated by fixed plan/JVM overhead (healthy — the work itself is
sub-linear at this scale); a factor near or above 10 at local scale
flags the queries whose data-proportional term already dominates and
which therefore deserve first scrutiny on a real cluster.

Usage:  python tools/scale_probe.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from bench import HEADLINE  # noqa: E402
from omldm_spark.queries import QUERIES  # noqa: E402
from omldm_spark.session import get_spark  # noqa: E402

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]

# Beyond the bench headline: the queries whose scaling story the 100 TB
# claim rests on (VERDICT r5 item 6) — iterative CC/ER closures, the
# prefix-filtered set-similarity join, and an update-mode twin driven
# through the KeyedUpsertSink publish path.
EXTRA = [
    "dedup_clusters",
    "entity_resolution_clusters",
    "prefix_filter_jaccard_pairs",
    "streaming_near_dedup",
    # round-6 continuation: the positional posting self-join (quadratic
    # only along shared diagonals) and the incremental contamination
    # matrix (per-batch cost vs corpus-sized oracle)
    "shared_span_pairs",
    "streaming_cross_source_overlap",
    # round-6 third wave: the PassJoin posting join (per-segment-bucket
    # quadratic), the canonical-bucket interval join (quadratic in
    # concurrency), the wedge join behind link prediction (sum deg^2),
    # and TextRank's per-round keyed joins over the word graph
    "passjoin_edit_pairs",
    "interval_overlap_pairs",
    "link_prediction_items",
    "textrank_keywords",
    # round-6 fourth wave: the spatial family (grid equi-join + CC-based
    # DBSCAN + truss peeling — per-cell quadratic in LOCAL density), the
    # reciprocal-kNN posting join, and the WL/HITS keyed round loops
    "dbscan_clusters",
    "ktruss_epsilon_edges",
    "mutual_knn_docs",
    "rake_keywords",
    "hits_item_authorities",
    # round-6 fifth wave: symmetry breaking (Luby in HEADLINE already),
    # the 22-round JP coloring recurrence, the signature-reuse banding
    # sweep (its truth join is the quadratic posting join), and the
    # token-mass mixing plan (pure scan + bounded agg)
    "jp_coloring_epsilon",
    "minhash_pr_calibration",
    "source_mixture_plan",
    # round-8: the degree-capped basket self-joins and the oriented
    # triangle count — the sum(deg^2) family the r7 verdict flagged
    "item_cooccurrence",
    "itemknn_recommendations",
    "item_triangles",
    # round-9: the web-curation family (map-only canonicalization +
    # keyed groupBys / windows) and the frontier anti-join
    "url_host_quota_sample",
    "url_frontier_ingest",
    "tfidf_cosine_pairs",
    # round-10: drift monitors (domain-bounded windows), the federated
    # merges (fact-scan agg + tiny window), KN (keyed reaggregations of
    # the bigram frame), preference ops (pair-matrix joins), LOO
    # valuation (funnel stats + |sources| window), and the multimodal
    # segmentations (explode + keyed agg / islands window)
    "ks_two_sample_value",
    "topk_sparse_merge",
    "cohens_kappa_labels",
    "source_loo_value",
    "video_shot_boundaries",
    "audio_silence_segments",
    "streaming_freq_drift",
    # round-10 tail: held-out KN scoring (three LEFT keyed joins over
    # the persisted model), the Louvain pass + modularity accounting
    # (persisted co-occurrence edges), the Cox Newton step
    # (duration-domain histogram), IPW (one fact agg), bigram novelty
    # (persisted vocab-scale frame + keyed join), and the two newest
    # additive-state IVM twins
    "kn_heldout_scores",
    "louvain_item_pass",
    "louvain_modularity_report",
    "cox_session_newton",
    "ipw_ate_report",
    "ngram_novelty_by_batch",
    "streaming_ks_two_sample",
    "streaming_robust_merge",
    # round-10 wave E/F (hilbert + draft acceptance + semdedup ride the
    # bench HEADLINE): the bounded-cell locality windows, the per-cell
    # BoN window + stack, the coalition math off one user-keyed pass,
    # the one-scan MW update, the lang-keyed ntile over LM scores, the
    # (lang, source) fertility rollup, and the two newest IVM twins
    "curve_locality_report",
    "best_of_n_curve",
    "tokenizer_fertility_report",
    "doremi_weight_round",
    "ccnet_perplexity_buckets",
    "adam_hub_rounds",
    "streaming_draft_acceptance",
    "streaming_best_of_n",
    # round-10 wave G/H/I: the coalition twin (min-fold state), the
    # skyline pair (domain-bounded sweep), the SPRT replay (arm-keyed
    # cumulative window), the fairness audit (funnel scan + |langs|
    # windows), the clipped merge (fact-scan agg), and the Adam twin
    "streaming_shapley_attribution",
    "skyline_users",
    "streaming_skyline_users",
    "sprt_decision_replay",
    "disparate_impact_report",
    "clipped_merge_report",
    "streaming_adam_hub",
    "ams_f2_report",
    "mmr_diverse_topk",
    "streaming_disparate_impact",
    # round-11: level-2 Louvain (community-graph pass), Wasserstein
    # (domain-bounded CDF window), Rocchio (broadcast feedback set),
    # ChiMerge (bounded bucket rounds), assortativity (keyed degree
    # joins + one agg), rec ranking rollup, the streaming source-
    # valuation + wordpiece vocabulary-state twins, and the rebuilt
    # Pregel JP (in EXTRA above) re-measured at 3 exchanges/round
    "louvain_second_pass",
    "wasserstein_value_periods",
    "rocchio_expansion_terms",
    "chimerge_value_bins",
    "assortativity_items",
    "rec_mrr_at5",
    "streaming_source_shapley",
    "streaming_wordpiece_scores",
    "dp_topk_terms",
    "functional_dependency_report",
    # round-12 (skew balance + dendrogram ride the bench HEADLINE):
    # the bloom pruning ledger (one fact scan + broadcast membership),
    # the per-FK fanout audit (key-space groupBys + aggregate-sized
    # crossJoins), the two-variant PQ/OPQ SSE (broadcast codebook
    # assignments), and the SCD2 invariant audit (one key window)
    "bloom_pruning_report",
    "join_cardinality_audit",
    "opq_vs_pq_distortion",
    "scd2_integrity_audit",
    # round-12 extension (the three batch queries ride the bench
    # HEADLINE): the UniMax statefold twin — per-source token counts
    # fold as keyed sums; the water-filling derives from state
    "streaming_unimax_plan",
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING_r6.json"
    spark = get_spark("scale-probe", master="local[32]",
                      shuffle_partitions=32)
    # warm codegen/JIT at the smallest SF so the timings compare work,
    # not first-compilation (bench.py rationale)
    probe_set = HEADLINE + EXTRA
    for name in probe_set:
        try:
            QUERIES[name](spark, SFS[0]).write.format("noop").mode(
                "overwrite").save()
        except Exception:  # noqa: BLE001
            pass

    results: dict[str, dict] = {}
    for name in probe_set:
        row: dict = {}
        for sf in SFS:
            key = sf.rsplit("/", 1)[1]
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, sf).write.format("noop").mode(
                "overwrite").save()
            row[key] = round(time.time() - t0, 3)
        row["factor_10x"] = (
            round(row["sf0.1"] / row["sf0.01"], 2)
            if row["sf0.01"] > 0 else None
        )
        results[name] = row
        print(f"{name:32s} {row['sf0.001']:7.2f} {row['sf0.01']:7.2f} "
              f"{row['sf0.1']:7.2f}  x10 factor {row['factor_10x']}")

    factors = sorted(
        (r["factor_10x"], n) for n, r in results.items()
        if r["factor_10x"] is not None
    )
    summary = {
        "queries": results,
        "median_factor_10x": factors[len(factors) // 2][0],
        "worst": [{"query": n, "factor_10x": f} for f, n in factors[-3:]],
    }
    with open(out_path, "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(f"\nmedian 10x-data runtime factor: "
          f"{summary['median_factor_10x']}  (wrote {out_path})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
