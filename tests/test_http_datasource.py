"""etlp-http Python DataSource: full format-registration read path
with a file:// manifest (no network; urllib serves file URLs)."""

import json

import pytest


@pytest.fixture()
def manifest_url(tmp_path):
    f1 = tmp_path / "part1.jsonl"
    f1.write_text('{"pid": 1, "status": "ok"}\n{"pid": 2, "status": "err"}\n')
    f2 = tmp_path / "part2.jsonl"
    f2.write_text('{"pid": 3, "status": "ok"}\n\n{"pid": 4}\n')
    manifest = tmp_path / "manifest.json"
    manifest.write_text(
        json.dumps({"output": [{"url": f1.as_uri()}, {"url": f2.as_uri()}]})
    )
    return manifest.as_uri()


def test_datasource_reads_manifest_partitions(spark, manifest_url):
    from etlp_spark.connectors.http_datasource import HttpJobDataSource

    spark.dataSource.register(HttpJobDataSource)
    df = (
        spark.read.format("etlp-http")
        .schema("pid long, status string")
        .option("url", manifest_url)
        .load()
    )
    # one Spark partition per manifest URL → executor-side fetch
    assert df.rdd.getNumPartitions() == 2
    rows = sorted((r.pid, r.status) for r in df.collect())
    assert rows == [(1, "ok"), (2, "err"), (3, "ok"), (4, None)]


def test_datasource_missing_field_is_null(spark, manifest_url):
    from etlp_spark.connectors.http_datasource import HttpJobDataSource

    spark.dataSource.register(HttpJobDataSource)
    df = (
        spark.read.format("etlp-http")
        .schema("pid long, nope string")
        .option("url", manifest_url)
        .load()
    )
    assert all(r.nope is None for r in df.collect())
