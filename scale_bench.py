"""Scale study: heavy dedup/ANN/text family AND the shuffle-heavy
relational family (round 6).

The 100 TB claims in PERF.md rest on plan audits (bounded LSH
buckets, checkpointed CC rounds, broadcast query sets, salted skew
joins). This harness adds the empirical datapoint: run the heaviest
queries at two generated scales (e.g. 10× and 100× of sf0.1) and
record whether wall-clock scales ~linearly — superlinear growth is
the signature of a candidate explosion, a driver collect, or a
shuffle whose volume is quadratic in data size. The x76/x78 lesson
(round 5): executed multi-scale measurements find what static plan
audits miss.

Scaled data is generated ONCE into ``.scale_data/x{N}/`` (gitignored)
by replicating sf0.1 with semantics-preserving perturbations:

- ``documents``: each replica r substitution-ciphers the letters of
  ``text`` (``F.translate`` with an md5-seeded permutation alphabet —
  JVM-side, distinct for every r, never identity). A substitution
  changes EVERY shingle, so replicas are NOT near-dups of each other:
  the dup/cluster structure of the corpus is reproduced per replica,
  not inflated N× — LSH bucket sizes and CC round counts stay
  distribution-faithful while volume grows N×.
- ``embeddings``: per-replica deterministic linear perturbation of
  every element (scale + dimension-dependent offset, ``F.transform``)
  and offset ``vec_id`` — cluster geometry is preserved per replica,
  centroids shift slightly, no exact duplicates.
- ``lineitem``/``orders``/``customer``: keys offset per replica with
  CONSISTENT offsets (l_orderkey and o_orderkey share one, o_custkey
  and c_custkey share one) so every join still matches within its
  replica — per-key join fan-out is preserved, volume grows N×.
- ``events``: event_id/user_id offset per replica, timestamps and
  types untouched — per-user session/as-of densities preserved.
- dimension tables (``region``/``nation``/``supplier``/``part``) copy
  through unscaled — dims grow far slower than facts in real
  warehouses, and an unscaled dim keeps broadcast-join plans honest.
  NB: per-dim-key fan-out (rows per supplier/nation) therefore grows
  N×; the queries here do per-fact work against dims, so that
  inflates group sizes, not pair counts.

Usage: ``python scale_bench.py [--scales 10,100] [--out FILE]
[--deep name:scale ...]``. ``--deep x73_bigram_logprob:300`` runs one
query at an extra scale (generating only the tables that query
needs) — the cheap way to add a confirmation point for a specific
plan-flip. Writes one JSON file with per-query seconds at each scale
plus the time ratio between the two LARGEST scales; superlinear
ratio = regression. Runs each query twice, keeps the best (first run
pays Janino compilation); ``--deep`` points run BEST-OF-3 (single
shots at a cold deep scale read 1.6-2x over warm steady-state — the
r10 judge audit).

Scale points are all GENERATED directories (32 parquet splits each):
the raw sf0.1 baseline plans only ~3 input splits per table, so
comparing it against a 32-split generated directory conflates data
volume with task parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import functions as F

HEAVY = [
    "x5_minhash_lsh",
    "x17_winnow_fingerprint",
    "x18_neardup_clusters",
    "x22_dedup_canonical",
    "x12_ivf_ann",
    "x47_quality_tertile_buckets",
    "f8_try_functions",
    # round-5 heavy additions
    "x70_segment_dedup",
    "x76_semdedup_prune",
    "x73_bigram_logprob",
    "x78_ngram_novelty",
    # round-6: the shuffle-heavy relational family
    "j8_salted_join_priority",
    "q18_large_volume_customer",
    "q21_waiting_supplier",
    "w7_session_paths",
    "j5_asof_last_signup",
    "j9_asof_forward_tolerance",
    "j12_asof_nearest",
    # round-7: the round-6 operators' scale-shape claims, executed
    "x84_token_gini",
    "x86_bloom_membership",
    "x87_dsir_importance",
    "x89_bpe_merge_candidates",
    # round-7 additions
    "x90_repeated_substring_spans",
    "x91_matryoshka_recall",
    "x92_cooccurrence_triangles",
    "x93_pq_adc_topk",
    "x94_ivf_adc_search",
    "x95_hybrid_rrf_fusion",
    "x96_cdc_apply_latest",
    # round-8 additions
    "x97_hll_registers",
    "x98_source_overlap_matrix",
    "x99_cuped_adjusted_delta",
    "x100_kcore_membership",
    "x102_zorder_layout",
    "x103_ddsketch_quantiles",
    "x105_unseen_mass",
    "x106_mixture_allocation",
    # round-9 additions
    "x103b_ddsketch_audited",
    "x107_pagerank_topk",
    "x108_kmeans_update",
    "x109_editdistance_neardup",
    "x110_funnel_steps",
    "x111_calibration_bins",
    "x112_k_anonymity",
    "x113_power_iteration",
    "x114_prefix_filter_jaccard",
    "x115_kneser_ney_bigram",
    "x116_poisson_bootstrap",
    "x117_hll_set_algebra",
    "x118_postings_delta_bits",
    "x119_l_diversity",
    "x120_cusum_drift",
    "x121_ams_f2",
    "x122_kmeanspp_oversample",
    "x123_feature_hashing",
    "x124_simpson_reversal",
    "x125_benford_audit",
    "x126_neyman_allocation",
    "x127_removal_effect_attribution",
    "x128_clustering_coefficient",
    "x129_fellegi_sunter",
    "x130_welch_ttest",
    "x131_power_mde",
    "x132_rendezvous_sharding",
    "x133_ks_test",
    "x134_dp_noised_release",
    "x135_sequence_perplexity",
    "x136_diff_in_diff",
    # round-10 additions
    "x137_ivf_persisted_search",
    "x138_pq_persisted_codes",
    "x139_psi_drift",
    "x140_mann_whitney",
    "x141_ivf_index_staleness",
    "x142_conformal_coverage",
    # round-11 additions
    "x143_mp3_metadata",
]

#: tables each heavy query scans — lets --deep runs generate only
#: what they need (and documents the blast radius of each query)
QUERY_TABLES = {
    "x5_minhash_lsh": ["documents"],
    "x17_winnow_fingerprint": ["documents"],
    "x18_neardup_clusters": ["documents"],
    "x22_dedup_canonical": ["documents"],
    "x12_ivf_ann": ["embeddings"],
    "x47_quality_tertile_buckets": ["documents"],
    "f8_try_functions": ["lineitem"],
    "x70_segment_dedup": ["documents"],
    "x76_semdedup_prune": ["embeddings"],
    "x73_bigram_logprob": ["documents"],
    "x78_ngram_novelty": ["documents"],
    "j8_salted_join_priority": ["orders", "lineitem"],
    "q18_large_volume_customer": ["customer", "orders", "lineitem"],
    "q21_waiting_supplier": ["lineitem", "orders", "nation", "supplier"],
    "w7_session_paths": ["events"],
    "j5_asof_last_signup": ["events"],
    "j9_asof_forward_tolerance": ["events"],
    "j12_asof_nearest": ["events"],
    "x84_token_gini": ["documents"],
    "x86_bloom_membership": ["documents"],
    "x87_dsir_importance": ["documents"],
    "x89_bpe_merge_candidates": ["documents"],
    "x90_repeated_substring_spans": ["documents"],
    "x91_matryoshka_recall": ["embeddings"],
    "x92_cooccurrence_triangles": ["events"],
    "x93_pq_adc_topk": ["embeddings"],
    "x94_ivf_adc_search": ["embeddings"],
    "x95_hybrid_rrf_fusion": ["documents", "embeddings"],
    "x96_cdc_apply_latest": ["orders"],
    "x97_hll_registers": ["documents"],
    "x98_source_overlap_matrix": ["documents"],
    "x99_cuped_adjusted_delta": ["events"],
    "x100_kcore_membership": ["events"],
    "x102_zorder_layout": ["lineitem"],
    "x103_ddsketch_quantiles": ["events"],
    "x105_unseen_mass": ["documents"],
    "x106_mixture_allocation": ["documents"],
    "x103b_ddsketch_audited": ["events"],
    "x107_pagerank_topk": ["events"],
    "x108_kmeans_update": ["embeddings"],
    "x109_editdistance_neardup": ["documents"],
    "x110_funnel_steps": ["events"],
    "x111_calibration_bins": ["events"],
    "x112_k_anonymity": ["events"],
    "x113_power_iteration": ["embeddings"],
    "x114_prefix_filter_jaccard": ["documents"],
    "x115_kneser_ney_bigram": ["documents"],
    "x116_poisson_bootstrap": ["lineitem"],
    "x117_hll_set_algebra": ["documents"],
    "x118_postings_delta_bits": ["documents"],
    "x119_l_diversity": ["events"],
    "x120_cusum_drift": ["events"],
    "x121_ams_f2": ["events"],
    "x122_kmeanspp_oversample": ["embeddings"],
    "x123_feature_hashing": ["documents"],
    "x124_simpson_reversal": ["events"],
    "x125_benford_audit": ["orders"],
    "x126_neyman_allocation": ["documents"],
    "x127_removal_effect_attribution": ["events"],
    "x128_clustering_coefficient": ["events"],
    "x129_fellegi_sunter": ["customer"],
    "x130_welch_ttest": ["events"],
    "x131_power_mde": ["events"],
    "x132_rendezvous_sharding": ["documents"],
    "x133_ks_test": ["documents"],
    "x134_dp_noised_release": ["events"],
    "x135_sequence_perplexity": ["events"],
    "x136_diff_in_diff": ["events"],
    "x137_ivf_persisted_search": ["embeddings"],
    "x138_pq_persisted_codes": ["embeddings"],
    "x139_psi_drift": ["documents"],
    "x140_mann_whitney": ["documents"],
    "x141_ivf_index_staleness": ["embeddings"],
    "x142_conformal_coverage": ["events"],
    "x143_mp3_metadata": ["documents"],
}

SCALED_TABLES = ["documents", "embeddings", "lineitem", "orders", "customer", "events"]
COPY_TABLES = ["region", "nation", "supplier", "part"]

BASE = "/root/testdata/sf0.1"
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_data")

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_ALPHA_UP = _ALPHA.upper()

# replica key offsets — one per key FAMILY so joins keep matching
_OFF_ORDER = 100_000_000
_OFF_CUST = 10_000_000
_OFF_DOC = 10_000_000
_OFF_VEC = 10_000_000
_OFF_EVENT = 1_000_000_000
_OFF_USER = 10_000_000


def _perm_alphabet(r: int) -> str:
    """Deterministic md5-seeded permutation of the alphabet for
    replica r — distinct substitution cipher per replica (never the
    identity for r > 0), valid for any replica count."""
    import hashlib
    import random

    seed = int(hashlib.md5(f"scale-replica-{r}".encode()).hexdigest()[:16], 16)
    letters = list(_ALPHA)
    random.Random(seed).shuffle(letters)
    perm = "".join(letters)
    if perm == _ALPHA:  # astronomically unlikely; rotate to be safe
        perm = _ALPHA[1:] + _ALPHA[0]
    return perm


def _replica(df, table: str, r: int):
    """Replica r of one base table (replica 0 = untouched)."""
    if table == "documents":
        if r:
            perm = _perm_alphabet(r)
            df = df.withColumn(
                "text",
                F.translate("text", _ALPHA + _ALPHA_UP, perm + perm.upper()),
            )
        return df.withColumn("doc_id", F.col("doc_id") + F.lit(r * _OFF_DOC))
    if table == "embeddings":
        if r:
            df = df.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x * (1.0 - r * 1e-4)
                        + (r * 1e-3) * ((i % 7) - 3).cast("float")
                    ).cast("float"),
                ),
            )
        return df.withColumn("vec_id", F.col("vec_id") + F.lit(r * _OFF_VEC))
    if table == "lineitem":
        return df.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(r * _OFF_ORDER)
        )
    if table == "orders":
        return df.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(r * _OFF_ORDER)
        ).withColumn("o_custkey", F.col("o_custkey") + F.lit(r * _OFF_CUST))
    if table == "customer":
        return df.withColumn("c_custkey", F.col("c_custkey") + F.lit(r * _OFF_CUST))
    if table == "events":
        return df.withColumn(
            "event_id", F.col("event_id") + F.lit(r * _OFF_EVENT)
        ).withColumn("user_id", F.col("user_id") + F.lit(r * _OFF_USER))
    raise ValueError(f"no replica recipe for table {table!r}")


def _union(parts):
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def _gen_scale(spark, n: int, tables: list[str]) -> str:
    """Materialize the needed tables of the x{n} directory (replicas
    0..n-1; replica 0 untouched). Incremental and idempotent: each
    table carries its own completion marker, so a --deep run that
    only needs ``documents`` doesn't pay for 60M lineitem rows."""
    out = os.path.join(ROOT, f"x{n}")
    os.makedirs(out, exist_ok=True)
    for t in tables:
        marker = os.path.join(out, f"_COMPLETE_{t}")
        if os.path.exists(marker):
            continue
        base = spark.read.parquet(f"{BASE}/{t}.parquet")
        if t in COPY_TABLES:
            base.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        else:
            parts = [_replica(base, t, r) for r in range(n)]
            _union(parts).repartition(32).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    return out


def _time_query(
    spark, qs, name: str, sf_dir: str, runs: int = 2
) -> tuple[float, float]:
    # construction INSIDE the timed window: queries built around an
    # eager localCheckpoint loop (x100 k-core, r2 pagerank) run their
    # real jobs at build time — timing only the final action would
    # report the cost of reading a checkpoint (found via x100's
    # impossible 0.05s at x100 scale; bench.py always timed this way)
    times = []
    for _ in range(runs):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return times[0], min(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10,100")
    ap.add_argument("--out", default="SCALE_BENCH_r06.json")
    ap.add_argument(
        "--deep", action="append", default=[],
        metavar="QUERY:SCALE",
        help="extra (query, scale) confirmation points, e.g. "
        "x73_bigram_logprob:300",
    )
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of HEAVY to run")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    queries = args.queries.split(",") if args.queries else HEAVY

    from etlp_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app_name="etlp-scale-bench")
    qs = entry.queries()

    needed = sorted(
        {t for q in queries for t in QUERY_TABLES.get(q, SCALED_TABLES)}
    )
    result: dict = {"base_sf": 0.1, "scales": scales, "queries": {}}
    for n in scales:
        sf_dir = _gen_scale(spark, n, needed)
        for name in queries:
            first, best = _time_query(spark, qs, name, sf_dir)
            result["queries"].setdefault(name, {})[f"x{n}"] = round(best, 3)
            print(f"x{n} {name}: first={first:.2f}s best={best:.2f}s", flush=True)

    for spec in args.deep:
        name, _, s = spec.partition(":")
        n = int(s)
        sf_dir = _gen_scale(spark, n, QUERY_TABLES.get(name, SCALED_TABLES))
        # deep points run BEST-OF-3 in-session: the r10 judge audit
        # measured cold single-session deep shots 1.6-2x over warm
        # steady-state (x98 x300: 31-41 s cold vs 18.9 s warm) — one
        # extra repetition absorbs the JVM/host cold phase the way the
        # regular-scale path's first/best discipline does at x10/x100.
        first, best = _time_query(spark, qs, name, sf_dir, runs=3)
        result["queries"].setdefault(name, {})[f"x{n}"] = round(best, 3)
        print(f"x{n} {name} (deep): first={first:.2f}s best={best:.2f}s", flush=True)

    lo, hi = f"x{scales[0]}", f"x{scales[-1]}"
    factor = scales[-1] / scales[0]
    for name, times in result["queries"].items():
        if lo in times and hi in times and times[lo] > 0:
            ratio = times[hi] / times[lo]
            times["time_ratio"] = round(ratio, 2)
            # per-row throughput ratio: 1.0 = perfectly linear scaling
            times["scaling_efficiency"] = round(factor / ratio, 2)
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
