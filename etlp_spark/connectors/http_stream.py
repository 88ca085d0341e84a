"""``etlp-http-feed`` — a *streaming* Python DataSource for paginated
HTTP feeds (the full answer to SURVEY.md's hard item #1: "HTTP polling
source as a real streaming source — custom Python DataSource with
offsets").

The batch DataSource (`http_datasource.py`) covers the async-job
handshake; this one covers the other reference pattern — a feed that
keeps producing pages (``src/etlp/processors/http.clj``'s poll loop,
made incremental). Model:

- the offset is a page cursor (``{"page": N}``), checkpointed by
  Spark — restart-safe, exactly-once per page;
- each micro-batch fetches the pages that appeared since the last
  offset (bounded by ``maxpagespertrigger`` — the backpressure knob,
  standing in for the reference's bounded channel buffers);
- ``readBetweenOffsets`` replays any page range deterministically
  (failure recovery re-fetches the same cursors).

The URL is a template with ``{page}``; ``file://`` URL templates make
the whole offset machinery testable offline (urllib serves them), the
same trick as the batch source.

Usage::

    spark.dataSource.register(HttpFeedDataSource)
    df = (spark.readStream.format("etlp-http-feed")
          .schema("pid long, status string")
          .option("url_template", "https://api.example/feed?page={page}")
          .load())
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

__all__ = ["HttpFeedDataSource"]


def _try_get(url: str, headers: dict[str, str]) -> bytes | None:
    """GET a page; None when the page doesn't exist yet (404/ENOENT —
    the feed's frontier)."""
    req = urllib.request.Request(url, headers=headers, method="GET")
    try:
        with urllib.request.urlopen(req) as resp:  # noqa: S310 — connector by design
            return resp.read()
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None
        raise
    except urllib.error.URLError:
        return None  # file:// missing page


class _FeedReader(SimpleDataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict[str, str]):
        self.schema = schema
        self.url_template = options["url_template"]
        self.headers = json.loads(options.get("headers", "{}"))
        self.max_pages = int(options.get("maxpagespertrigger", "10"))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _fetch_page(self, page: int) -> list[tuple] | None:
        body = _try_get(self.url_template.format(page=page), self.headers)
        if body is None:
            return None
        names = self.schema.fieldNames()
        rows = []
        for line in body.decode("utf-8").splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue  # E1: log-and-continue — a bad page line must not kill the stream
            rows.append(tuple(obj.get(n) for n in names))
        return rows

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        page = start["page"]
        out: list[tuple] = []
        fetched = 0
        while fetched < self.max_pages:
            rows = self._fetch_page(page)
            if rows is None:
                break  # frontier reached
            out.extend(rows)
            page += 1
            fetched += 1
        return iter(out), {"page": page}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        out: list[tuple] = []
        for page in range(start["page"], end["page"]):
            rows = self._fetch_page(page)
            if rows:
                out.extend(rows)
        return iter(out)

    def commit(self, end: dict) -> None:
        pass  # nothing to ack — pages are immutable


class HttpFeedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "etlp-http-feed"

    def schema(self) -> str:
        return "value string"

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _FeedReader(schema, dict(self.options))
