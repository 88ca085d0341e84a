"""x92 per-stage shuffle timing probe (r15, the closure PERF.md named
for the r14 x600 residual): one quiet session, single reps, stages of
x92 materialized separately at x600/x1000 under shuffle.partitions
32 vs 96.

Stage boundaries are x92's own materialization points, so the stage
times decompose the real query: ``pairs`` (presence distinct → bucket
agg/cap → pair explode → (ua,ub) aggregate, ending at the first
localCheckpoint), ``ori`` (degree agg + orientation joins, ending at
the second localCheckpoint), ``tri`` (the two oriented equi-joins +
per-user aggregate + top-20, ending at a noop write). Forced
gc + JVM System.gc between cells per the r14 OOM lesson (two
localCheckpoint generations exceed 64g).
"""
import gc
import json
import os
import time

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")

from pyspark.sql import functions as F  # noqa: E402

from etlp_spark.queries import _t_fanout  # noqa: E402
from etlp_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/SCALE_BENCH_r15_x92_stages.json"
spark = get_spark(app_name="x92-stage-probe")
out = {
    "cells": {},
    "note": (
        "single reps, one session; stage = seconds to materialize "
        "that frame (pairs/ori eager localCheckpoint, tri noop write "
        "of the top-20); stages sum to ~the full query"
    ),
}

for parts in (32, 96):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    for scale in (600, 1000):
        d = f"/root/repo/.scale_data/graph_x{scale}"
        cell = f"x{scale}_p{parts}"

        ev = _t_fanout(spark, d, "events")
        pres = ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("hb"), "user_id"
        ).distinct()
        bu = (
            pres.groupBy("event_type", "hb")
            .agg(F.collect_set("user_id").alias("us0"))
            .where((F.size("us0") >= 2) & (F.size("us0") <= 32))
            .select("event_type", "hb", F.sort_array("us0").alias("us"))
        )
        t0 = time.time()
        pairs = (
            bu.select(
                F.explode(
                    F.expr(
                        "flatten(transform(us, (u, i) -> "
                        "transform(slice(us, i + 2, size(us)), "
                        "v -> struct(u AS ua, v AS ub))))"
                    )
                ).alias("p")
            )
            .select("p.ua", "p.ub")
            .groupBy("ua", "ub")
            .agg(F.count(F.lit(1)).cast("long").alias("shared"))
            .where(F.col("shared") >= 3)
            .localCheckpoint()
        )
        t_pairs = round(time.time() - t0, 2)

        deg = (
            pairs.select(F.col("ua").alias("u"))
            .unionAll(pairs.select(F.col("ub").alias("u")))
            .groupBy("u")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        da = deg.select(F.col("u").alias("ua"), F.col("d").alias("da"))
        db = deg.select(F.col("u").alias("ub"), F.col("d").alias("db"))
        lower_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("ua") < F.col("ub"))
        )
        t0 = time.time()
        ori = (
            pairs.join(da, "ua").join(db, "ub")
            .select(
                F.when(lower_first, F.col("ua"))
                .otherwise(F.col("ub")).alias("src"),
                F.when(lower_first, F.col("ub"))
                .otherwise(F.col("ua")).alias("dst"),
                F.when(lower_first, F.col("db"))
                .otherwise(F.col("da")).alias("dd"),
            )
            .localCheckpoint()
        )
        t_ori = round(time.time() - t0, 2)

        e1 = ori.select(
            F.col("src").alias("a"), F.col("dst").alias("b"),
            F.col("dd").alias("bd"),
        )
        e2 = ori.select(
            F.col("src").alias("a"), F.col("dst").alias("c"),
            F.col("dd").alias("cd"),
        )
        e3 = ori.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        t0 = time.time()
        tri = (
            e1.join(e2, "a")
            .where(
                (F.col("cd") > F.col("bd"))
                | ((F.col("cd") == F.col("bd")) & (F.col("c") > F.col("b")))
            )
            .join(e3, ["b", "c"])
        )
        per_user = (
            tri.select(F.col("a").alias("u"))
            .unionAll(tri.select(F.col("b").alias("u")))
            .unionAll(tri.select(F.col("c").alias("u")))
            .groupBy("u")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
        )
        per_user.orderBy(F.col("n_tri").desc(), "u").limit(20).write.format(
            "noop"
        ).mode("overwrite").save()
        t_tri = round(time.time() - t0, 2)

        out["cells"][cell] = {
            "pairs": t_pairs, "ori": t_ori, "tri": t_tri,
            "total": round(t_pairs + t_ori + t_tri, 2),
        }
        print(f"{cell}: pairs={t_pairs} ori={t_ori} tri={t_tri}", flush=True)
        tmp = OUT + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
        os.replace(tmp, OUT)

        # drop checkpoint blocks before the next cell (r14 OOM lesson)
        del pairs, ori
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass

print("done", flush=True)
