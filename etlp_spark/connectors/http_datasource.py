"""``etlp-http`` — the HTTP async-job source as a real Spark 4 Python
DataSource (SURVEY.md §7 "what's hard" #1).

`connectors/http.py` prototypes the polling handshake driver-side
(ref ``src/etlp/processors/http.clj:17-95``); this module promotes it
to a first-class ``spark.read.format("etlp-http")`` source:

- the driver runs the tiny control-plane state machine (start →
  poll → manifest), exactly the FHIR-bulk-export shape;
- each manifest ``output`` URL becomes an ``InputPartition``, so the
  DATA plane is fetched **by executors in parallel** — nothing heavy
  funnels through the driver, which is the property that matters at
  scale (a bulk export can be thousands of files);
- records are parsed against the user-supplied schema with the same
  PERMISSIVE null-on-mismatch stance as the jsonl source.

Usage::

    spark.dataSource.register(HttpJobDataSource)
    df = (spark.read.format("etlp-http")
          .schema("pid long, status string")
          .option("url", "https://api.example/export")
          .load())

Testable without a network: ``urllib`` transparently handles
``file://`` URLs, so a manifest pointing at local files exercises the
full partition-per-URL read path.
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType

__all__ = ["HttpJobDataSource"]


def _get(url: str, headers: dict[str, str]) -> tuple[int, dict[str, str], bytes]:
    req = urllib.request.Request(url, headers=headers, method="GET")
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — connector by design
        status = getattr(resp, "status", None) or 200  # file:// responses carry no status
        return status, dict(getattr(resp, "headers", {}) or {}), resp.read()


class _UrlPartition(InputPartition):
    def __init__(self, url: str):
        self.url = url


class _HttpJobReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self.schema = schema
        self.url = options["url"]
        self.headers = json.loads(options.get("headers", "{}"))
        self.poll_interval = float(options.get("pollintervals", options.get("poll_interval_s", "5")))
        self.max_polls = int(options.get("maxpolls", "60"))

    # ---- control plane (driver-side, metadata only) -----------------
    def _run_handshake(self) -> list[str]:
        status, headers, body = _get(self.url, {**self.headers, "prefer": "respond-async"})
        loc = {k.lower(): v for k, v in headers.items()}.get("content-location")
        if status in (201, 202) and loc:
            for _ in range(self.max_polls):
                status, _, body = _get(loc, self.headers)
                if status == 200:
                    break
                if status >= 400:
                    raise RuntimeError(f"async job failed: HTTP {status}")
                time.sleep(self.poll_interval)
            else:
                raise TimeoutError(f"job not done after {self.max_polls} polls")
        manifest = json.loads(body)
        if isinstance(manifest, dict) and isinstance(manifest.get("output"), list):
            return [e["url"] for e in manifest["output"] if "url" in e]
        # no manifest → the body itself is the (single-partition) data
        return []

    def partitions(self) -> Sequence[InputPartition]:
        urls = self._run_handshake()
        if not urls:
            return [_UrlPartition(self.url)]
        return [_UrlPartition(u) for u in urls]

    # ---- data plane (executor-side, one URL per partition) ----------
    def read(self, partition: _UrlPartition) -> Iterator[tuple]:
        status, _, body = _get(partition.url, self.headers)
        if status != 200:
            raise RuntimeError(f"output fetch failed: HTTP {status} for {partition.url}")
        names = self.schema.fieldNames()
        for line in body.decode("utf-8").splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                obj = {}
            yield tuple(obj.get(n) for n in names)


class HttpJobDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "etlp-http"

    def schema(self) -> str:
        # schema must be supplied by the caller (.schema(...)); this
        # fallback only exists so load() without one fails clearly
        return "value string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return _HttpJobReader(schema, dict(self.options))
