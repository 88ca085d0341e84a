"""Scale study for the heavy dedup/ANN/text family.

The 100 TB claims in PERF.md rest on plan audits (bounded LSH
buckets, checkpointed CC rounds, broadcast query sets). This harness
adds the missing empirical datapoint: run the heaviest queries at
1× (sf0.1) and 10× (a generated "sf1") and record whether wall-clock
scales ~linearly — superlinear growth is the signature of a candidate
explosion, a driver collect, or a shuffle whose volume is quadratic
in data size.

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
- ``lineitem``: ``l_orderkey`` offset per replica, values untouched.

Usage: ``python scale_bench.py [--scales 10,30] [--out FILE]``.
Writes one JSON file with per-query seconds at each scale plus the
time ratio between the two LARGEST scales; rows/sec should be
roughly flat (ratio ≈ the scale-factor ratio; superlinear =
regression). Runs each query twice, keeps the best (first run pays
Janino compilation).

Scale points are both GENERATED directories (32 parquet splits
each): the raw sf0.1 baseline plans only ~3 input splits per table,
so comparing it against a 32-split generated directory conflates
data volume with task parallelism — at sub-second scale several
queries get FASTER at 10× simply because 32 tasks beat 3.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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
]

BASE = "/root/testdata/sf0.1"
ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".scale_data")

_ALPHA = "abcdefghijklmnopqrstuvwxyz"
_ALPHA_UP = _ALPHA.upper()


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


def _gen_scale(spark, n: int) -> str:
    """Materialize the x{n} directory (replicas 0..n-1; replica 0 is
    the untouched sf0.1 data). Idempotent: skips if present."""
    out = os.path.join(ROOT, f"x{n}")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")

    doc_parts = []
    for r in range(n):
        d = docs
        if r:
            perm = _perm_alphabet(r)
            d = d.withColumn(
                "text",
                F.translate("text", _ALPHA + _ALPHA_UP,
                            perm + perm.upper()),
            )
        doc_parts.append(
            d.withColumn("doc_id", F.col("doc_id") + F.lit(r * 10_000_000))
        )
    _union(doc_parts).repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    emb_parts = []
    for r in range(n):
        e = emb
        if r:
            # per-replica linear perturbation: x' = x*(1 - r*1e-4)
            # + r*1e-3*((i mod 7) - 3); deterministic, geometry-preserving
            e = e.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x * (1.0 - r * 1e-4)
                        + (r * 1e-3) * ((i % 7) - 3).cast("float")
                    ).cast("float"),
                ),
            )
        emb_parts.append(
            e.withColumn("vec_id", F.col("vec_id") + F.lit(r * 10_000_000))
        )
    _union(emb_parts).repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    li_parts = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(r * 100_000_000))
        for r in range(n)
    ]
    _union(li_parts).repartition(32).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )

    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out


def _union(parts):
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="10,30")
    ap.add_argument("--out", default="SCALE_BENCH_r05.json")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from etlp_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(app_name="etlp-scale-bench")
    qs = entry.queries()

    result: dict = {"base_sf": 0.1, "scales": scales, "queries": {}}
    for n in scales:
        sf_dir = BASE if n == 1 else _gen_scale(spark, n)
        for name in HEAVY:
            df = qs[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            first = time.time() - t0
            df2 = qs[name](spark, sf_dir)
            t0 = time.time()
            df2.write.format("noop").mode("overwrite").save()
            second = time.time() - t0
            result["queries"].setdefault(name, {})[f"x{n}"] = round(
                min(first, second), 3
            )
            print(f"x{n} {name}: first={first:.2f}s best={min(first, second):.2f}s",
                  flush=True)

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
