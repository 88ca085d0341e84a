"""HTTP async-job polling source (ref: S2, the FHIR-bulk-export-style
``AsyncHTTP`` protocol at ``src/etlp/processors/http.clj:11-95``).

The reference's state machine:

    start    → GET with ``prefer: respond-async`` → job URL
               (``http.clj:17-30``)
    check    → poll status every 5 s until 200 (``http.clj:44-57``)
    list!    → poll + JSON-decode body (``http.clj:59-78``)
    download → poll + return body bytes (``http.clj:80-95``)

Spark has no native primitive for this (SURVEY.md §4.2): the job
handshake is inherently driver-side. The design here:

- the polling state machine runs on the driver (tiny metadata), with
  an injectable ``transport`` callable so tests run without a network
  and a real deployment passes ``urllib``/``requests``;
- the *payload* becomes a DataFrame via ``spark.read.json`` over a
  parallelized body or (for file manifests, the FHIR bulk pattern)
  a distributed read of the listed URLs — so the heavy data never
  funnels through the driver.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from etlp_spark.connectors.base import CheckResult, Source

#: transport(method, url, headers) -> (status_code, headers, body_bytes)
Transport = Callable[[str, str, dict[str, str]], tuple[int, dict[str, str], bytes]]


def urllib_transport(method: str, url: str, headers: dict[str, str]) -> tuple[int, dict[str, str], bytes]:
    """Default transport for real deployments (stdlib only)."""
    import urllib.request

    req = urllib.request.Request(url, headers=headers, method=method)
    with urllib.request.urlopen(req) as resp:  # noqa: S310 — connector by design
        return resp.status, dict(resp.headers), resp.read()


@dataclass
class HttpPollingSource(Source):
    api_url: str
    headers: dict[str, str] = field(default_factory=dict)
    transport: Transport = urllib_transport
    poll_interval_s: float = 5.0  # ref: Thread/sleep 5000, http.clj:50
    max_polls: int = 60
    stream_name: str = "http-async-stream"

    def spec(self) -> dict[str, Any]:
        return {
            "type": "http/async-job",
            "api_url": self.api_url,
            "poll_interval_s": self.poll_interval_s,
        }

    # -- the reference's AsyncHTTP protocol, driver-side -------------
    def start(self) -> str:
        """Kick off the async job; returns the status-poll URL
        (``Content-Location`` header, ref ``http.clj:24-29``)."""
        status, headers, _ = self.transport(
            "GET", self.api_url, {**self.headers, "prefer": "respond-async"}
        )
        if status not in (200, 201, 202):
            raise RuntimeError(f"async start failed: HTTP {status}")
        loc = {k.lower(): v for k, v in headers.items()}.get("content-location")
        if not loc:
            raise RuntimeError("async start returned no Content-Location")
        return loc

    def poll(self, location: str) -> bytes:
        """Poll until 200, then return the body (ref ``check``/
        ``download``, ``http.clj:44-57,80-95``)."""
        for _ in range(self.max_polls):
            status, _, body = self.transport("GET", location, self.headers)
            if status == 200:
                return body
            if status >= 400:
                raise RuntimeError(f"async job failed: HTTP {status}")
            time.sleep(self.poll_interval_s)
        raise TimeoutError(f"async job did not complete after {self.max_polls} polls")

    def list_output(self, location: str) -> Any:
        """Poll + JSON-decode (ref ``list!``, ``http.clj:59-78``)."""
        return json.loads(self.poll(location))

    # -- Source protocol ---------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """Run the whole handshake and land the payload distributed.

        If the completed job's body is a JSON object with an
        ``output`` list of ``{"url": ...}`` entries (the bulk-export
        manifest shape), the URLs are read as distributed json lines;
        otherwise the body itself is parsed as JSON records.
        """
        location = self.start()
        body = self.poll(location)
        payload = json.loads(body)
        if isinstance(payload, dict) and isinstance(payload.get("output"), list):
            urls = [entry["url"] for entry in payload["output"] if "url" in entry]
            return self._json_lines_df(spark, self._fetch_all(urls))
        records = payload if isinstance(payload, list) else [payload]
        return self._json_lines_df(spark, [json.dumps(r) for r in records])

    @staticmethod
    def _json_lines_df(spark: SparkSession, lines: list[str]) -> DataFrame:
        """JSON lines (already on the driver) → DataFrame with full
        ``spark.read.json`` schema inference.

        On a classic session the lines ship to executors via
        ``parallelize`` (works on any multi-node cluster). On Spark
        Connect — no ``sparkContext`` — they stage through a temp file
        that only the Connect SERVER reads, so this path requires the
        client and server to share a filesystem (true for local
        Connect; a remote Connect deployment should use the
        ``etlp-http`` DataSource, which fetches executor-side —
        `http_datasource.py` — instead of this driver-side prototype).
        The temp file is removed at interpreter exit."""
        try:
            sc = spark.sparkContext
        except Exception:  # Spark Connect: no JVM-backed context
            sc = None
        if sc is not None:
            return spark.read.json(sc.parallelize(lines or ["{}"]))
        import atexit
        import os
        import tempfile

        tmp = tempfile.NamedTemporaryFile(
            mode="w", suffix=".jsonl", delete=False, encoding="utf-8"
        )
        with tmp:
            tmp.write("\n".join(lines))
        atexit.register(lambda p=tmp.name: os.path.exists(p) and os.unlink(p))
        return spark.read.json("file://" + tmp.name)

    def _fetch_all(self, urls: list[str]) -> list[str]:
        lines: list[str] = []
        for url in urls:
            status, _, body = self.transport("GET", url, self.headers)
            if status != 200:
                raise RuntimeError(f"output fetch failed: HTTP {status} for {url}")
            lines.extend(body.decode("utf-8").splitlines())
        return lines

    def check(self, spark: SparkSession) -> CheckResult:
        try:
            status, _, _ = self.transport("GET", self.api_url, self.headers)
            return CheckResult(status < 500, f"HTTP {status}")
        except Exception as e:  # noqa: BLE001
            return CheckResult(False, f"{type(e).__name__}: {e}")
