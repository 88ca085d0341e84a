"""etlp-http-feed streaming DataSource: offset progression across
micro-batches with file:// page templates (offline)."""

import pytest


@pytest.fixture()
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    (d / "0.jsonl").write_text('{"pid": 1}\n{"pid": 2}\n')
    (d / "1.jsonl").write_text('{"pid": 3}\n')
    return d


def test_feed_stream_offsets_advance(spark, feed_dir, tmp_path):
    from etlp_spark.connectors.http_stream import HttpFeedDataSource

    spark.dataSource.register(HttpFeedDataSource)
    df = (
        spark.readStream.format("etlp-http-feed")
        .schema("pid long")
        .option("url_template", feed_dir.as_uri() + "/{page}.jsonl")
        .load()
    )
    q = (
        df.writeStream.format("memory")
        .queryName("feed1")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert sorted(r.pid for r in spark.sql("select * from feed1").collect()) == [1, 2, 3]
        # a new page appears → only it is consumed next trigger
        (feed_dir / "2.jsonl").write_text('{"pid": 4}\n')
        q.processAllAvailable()
        assert sorted(r.pid for r in spark.sql("select * from feed1").collect()) == [1, 2, 3, 4]
    finally:
        q.stop()


def test_feed_stream_restart_resumes_from_checkpoint(spark, feed_dir, tmp_path):
    from etlp_spark.connectors.http_stream import HttpFeedDataSource

    spark.dataSource.register(HttpFeedDataSource)

    out = str(tmp_path / "out")

    def start():
        # memory sink can't recover from checkpoints; parquet can
        return (
            spark.readStream.format("etlp-http-feed")
            .schema("pid long")
            .option("url_template", feed_dir.as_uri() + "/{page}.jsonl")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .start()
        )

    q1 = start()
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert sorted(r.pid for r in spark.read.parquet(out).collect()) == [1, 2, 3]
    (feed_dir / "2.jsonl").write_text('{"pid": 9}\n')
    q2 = start()
    try:
        q2.processAllAvailable()
        # pages 0-1 are not re-fetched; exactly the new page lands
        assert sorted(r.pid for r in spark.read.parquet(out).collect()) == [1, 2, 3, 9]
    finally:
        q2.stop()
