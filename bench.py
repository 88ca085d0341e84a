"""Benchmark runner — one JSON line on stdout.

Runs every declared query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]``. Each query is
executed through the ``noop`` sink so the full physical plan runs
(collect-free: nothing funnels through the driver, matching how the
engine is meant to be used at scale).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from etlp_spark.queries import QUERIES
    from etlp_spark.session import get_spark

    # Debug/CI subset: SPARK_GRAFT_BENCH_ONLY=q01_pricing_summary,t2_...
    # limits the run to the named queries (the contract test uses this
    # to exercise the full bench pipeline in seconds).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in QUERIES]
        if unknown:
            print(f"bench: unknown query names {unknown}", file=sys.stderr)
            sys.exit(2)
        QUERIES = {n: QUERIES[n] for n in names}

    spark = get_spark(app_name="etlp-spark-bench")
    # warm the JVM + every table's parquet footers once so per-query
    # timings measure plan+execute, not first-touch file listing
    from etlp_spark.io import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    # Pre-fork the Python worker pool (spark.python.worker.reuse keeps
    # them alive): Arrow-kernel queries otherwise pay ~0.5 s × cores of
    # interpreter startup inside whichever query happens to run first,
    # which makes per-query timings order-dependent.
    import pandas as pd  # noqa: F401

    spark.range(spark.sparkContext.defaultParallelism * 4).repartition(
        spark.sparkContext.defaultParallelism
    ).mapInPandas(lambda it: it, "id long").count()

    def run_once(q) -> float:
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.perf_counter() - t0, 3)
        # Iterative queries persist/checkpoint intermediates; drop them
        # so cached relations don't accumulate across the 90+-query run
        # and distort later timings. clearCache() frees persist()'d
        # relations; the gc.collect() drops Python references to
        # localCheckpoint'd frames so Spark's ContextCleaner can free
        # their blocks too (they are NOT in the SQL cache manager).
        spark.catalog.clearCache()
        import gc

        gc.collect()
        return dt

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, q in sorted(QUERIES.items()):
        # One broken query must not zero the whole bench: record the
        # failure and keep going (the driver's JSON gets an "errors"
        # map alongside per-query times).
        try:
            times[name] = run_once(q)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:500]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    # Single-tenant timing isn't guaranteed here (shared VM): a ~20 s
    # external stall occasionally lands on one arbitrary query. Re-run
    # outliers (> max(2 s, 3× median)) once and keep the faster of the
    # two full executions — same work, stall-robust.
    med = sorted(times.values())[len(times) // 2] if times else 0.0
    reruns: dict[str, dict[str, float]] = {}
    for name in [n for n, t in times.items() if t > max(2.0, 3 * med)]:
        try:
            second = run_once(QUERIES[name])
        except Exception:  # noqa: BLE001
            continue  # keep the first (successful) timing
        # Self-documenting noise: record BOTH executions so the
        # artifact shows whether a slow first run was contention
        # (second run fast) or real cost (both slow).
        reruns[name] = {"first": times[name], "rerun": round(second, 3)}
        times[name] = min(times[name], round(second, 3))

    total = round(sum(times.values()), 3)
    out = {
        "metric": "declared_query_set_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        # The query set GROWS every round (76 at the round-1 baseline,
        # 120 now), so the comparable figure across rounds is
        # per-query mean, not the raw total.
        "n_queries": len(times),
        "mean_sec_per_query": round(total / len(times), 3) if times else None,
    }
    if reruns:
        out["outlier_reruns"] = reruns
    if errors:
        # Honesty guard: a crashed query is dropped from `times`, which
        # would otherwise make the headline total/mean look BETTER than
        # a fully-passing run. Surface the failure count at the top
        # level (not just in the errors map) so the metric can't be
        # read as a complete run.
        out["n_failed"] = len(errors)
        out["complete"] = False
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
