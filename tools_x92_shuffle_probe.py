"""x92 shuffle-partitions attribution probe (r14): one quiet session,
single reps of x92 at x600/x1000 under shuffle.partitions 32 vs 96 —
if the x600 per-edge bump moves with the partition count, the bump is
shuffle-layout regime, not data."""
import gc, json, os, time
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "64g")
from etlp_spark.session import get_spark
import __spark_entry__ as _entry
QUERIES = _entry.queries()
spark = get_spark()
out = {"cells": {}, "note": "single reps, one session, conf set between cells"}
for parts in (32, 96):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    for scale in (600, 1000):
        d = f"/root/repo/.scale_data/graph_x{scale}"
        t0 = time.time()
        QUERIES["x92_cooccurrence_triangles"](spark, d).write.format("noop").mode("overwrite").save()
        sec = round(time.time() - t0, 2)
        out["cells"][f"x{scale}_p{parts}"] = sec
        print(f"x{scale} parts={parts}: {sec}s", flush=True)
        tmp = "/root/repo/SCALE_BENCH_r14_x92_shuffle.json.tmp"
        with open(tmp, "w") as fh:
            json.dump(out, fh, indent=1)
        os.replace(tmp, "/root/repo/SCALE_BENCH_r14_x92_shuffle.json")
        gc.collect()
        try:
            spark._jvm.System.gc()
        except Exception:
            pass
print("done", flush=True)
