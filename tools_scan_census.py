"""Per-query parquet-scan census: for every declared query, count
``Scan parquet`` nodes per table in the FINAL physical plan (the
duplicate-corpus-pass regression class the r17/r18 optimization rounds
eliminated). Construct-time pin jobs execute as a side effect of
building each DataFrame; the census itself reads the unexecuted plan,
so no query is run.

Writes SCAN_CENSUS.json: {query: {table: n_scan_nodes}} (tables with
zero scans omitted; queries whose final plan reads only pinned leaves
come out as {}).

Usage: python tools_scan_census.py [--sf DIR] [--out SCAN_CENSUS.json]
"""

from __future__ import annotations

import argparse
import json
import re


def census_for(df) -> dict[str, int]:
    text = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return census_from_text(text)


def census_from_text(text: str) -> dict[str, int]:
    # Count each scan once via the numbered detail header, e.g.
    # "(3) Scan parquet " followed by a Location: line naming the
    # table file; the tree section repeats the same node ids.
    out: dict[str, int] = {}
    seen: set[str] = set()
    blocks = re.split(r"\n\((\d+)\) ", text)
    # blocks: [prefix, id, body, id, body, ...]
    for i in range(1, len(blocks) - 1, 2):
        nid, body = blocks[i], blocks[i + 1]
        if nid in seen:
            continue
        seen.add(nid)
        first = body.split("\n", 1)[0]
        if not first.startswith("Scan parquet"):
            continue
        m = re.search(r"Location:.*?/([A-Za-z0-9_]+)\.parquet", body)
        table = m.group(1) if m else "<unknown>"
        out[table] = out.get(table, 0) + 1
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="SCAN_CENSUS.json")
    args = ap.parse_args()

    from etlp_spark.queries import QUERIES
    from etlp_spark.session import get_spark

    spark = get_spark(app_name="etlp-scan-census")
    out: dict = {}
    import gc
    import time

    t0 = time.time()
    for name, q in QUERIES.items():
        df = q.fn(spark, args.sf)
        out[name] = census_for(df)
        spark.catalog.clearCache()
        gc.collect()
    total = sum(sum(v.values()) for v in out.values())
    multi = {
        n: t for n, t in out.items() if any(c >= 3 for c in t.values())
    }
    print(
        f"{len(out)} queries, {total} scan nodes, "
        f">=3-same-table: {sorted(multi)} ({time.time() - t0:.0f}s)"
    )
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=0, sort_keys=True)


if __name__ == "__main__":
    main()
