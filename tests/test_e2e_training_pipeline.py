"""End-to-end training-data curation pipeline — every stage composed
from the engine's public API, the way a user of the reference would
assemble it after switching (README quickstart shape, scaled up):

    parquet source → language/quality gates → exact dedup →
    near-dup clustering (MinHash→LSH→connected components) →
    canonical selection → RAG chunking → versioned snapshot store →
    incremental second batch (anti-join against the store)

Each stage's operator is oracle- or property-tested on its own
elsewhere; THIS test pins the composition: stages agree on ids,
counts are conserved (nothing duplicated, nothing silently dropped
beyond what each gate accounts for), and the store's versions give
the incremental-ingest story."""

import pytest
from pyspark.sql import functions as F

from etlp_spark import io, ops
from etlp_spark.connectors.snapshots import SnapshotSink, SnapshotStore
from etlp_spark.functions.dedup import (
    connected_components,
    exact_dedup,
    lsh_candidates,
    minhash_signature,
)
from etlp_spark.functions.text import chunk_documents, lang_id, quality_score, tokens
from etlp_spark.pipeline import Pipeline

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return io.load_table(spark, SF, "documents")


def test_full_curation_pipeline(spark, docs, tmp_path):
    n_raw = docs.count()

    # -- stage 1: gates (scan-stage expressions, no shuffle) ----------
    gated = (
        docs.withColumn("lang_pred", lang_id("text"))
        .withColumn("quality", quality_score("text"))
        .where(F.col("quality") > 0)
        .where(F.size(F.split(F.col("text"), r"\s+")) >= 5)
    )
    n_gated = gated.count()
    assert 0 < n_gated <= n_raw

    # -- stage 2: exact dedup (one shuffle on the 16-byte fp) ---------
    keepers = exact_dedup(gated)
    n_exact = keepers.count()
    assert n_exact <= n_gated
    assert keepers.agg(F.sum("n_dups")).first()[0] == n_gated  # conservation
    exact_kept = gated.join(
        keepers.select(F.col("keeper").alias("doc_id")), "doc_id"
    )

    # -- stage 3: near-dup clusters → canonical (cluster == doc_id) ---
    sigs = minhash_signature(exact_kept, k=16, n=3)
    pairs = lsh_candidates(sigs, k=16, bands=4, max_bucket=50).where(
        F.col("est_jaccard") >= 0.5
    )
    labels = connected_components(exact_kept.select("doc_id"), pairs)
    assert labels.count() == n_exact  # every doc labeled, none invented
    canonical = exact_kept.join(labels, "doc_id").where(
        F.col("cluster") == F.col("doc_id")
    )
    n_canon = canonical.count()
    assert 0 < n_canon <= n_exact

    # -- stage 4: chunking (scan-fused fan-out) -----------------------
    chunks = chunk_documents(canonical, size=32, stride=24)
    n_chunks = chunks.count()
    assert n_chunks >= n_canon  # every surviving doc yields >= 1 chunk
    assert chunks.select("doc_id").distinct().count() == n_canon
    # chunk token coverage: per doc, last chunk reaches the last token
    cov = (
        chunks.groupBy("doc_id")
        .agg(F.max(F.col("start_tok") + F.col("chunk_len") - 1).alias("covered"))
        .join(canonical.select("doc_id", F.size(tokens("text")).alias("n")), "doc_id")
        .where(F.col("covered") < F.col("n"))
    )
    assert cov.count() == 0

    # -- stage 5: commit to the versioned store via the Pipeline API --
    root = str(tmp_path / "corpus")
    result = Pipeline(
        source=chunks,
        transforms=[ops.where(F.col("chunk_len") >= 1)],
        sink=SnapshotSink(root),
    ).run(spark)
    assert result.rows == n_chunks
    store = SnapshotStore(root)
    assert store.versions() == [1]

    # -- stage 6: incremental second batch ----------------------------
    # a re-crawl delivers the same corpus plus "new" docs (id-offset
    # clones stand in — testdata is read-only); only genuinely new
    # chunk KEYS may append: anti-join against the store, the x38
    # fingerprint-store pattern on store versions.
    recrawl = canonical.withColumn(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.col("doc_id") + 1_000_000).otherwise(
            F.col("doc_id")
        ),
    )
    new_chunks = chunk_documents(recrawl, size=32, stride=24)
    prev_keys = store.read(spark).select("doc_id", "chunk_idx")
    fresh = new_chunks.join(prev_keys, ["doc_id", "chunk_idx"], "left_anti")
    n_fresh = fresh.count()
    n_offset_docs = recrawl.where(F.col("doc_id") >= 1_000_000).count()
    assert n_offset_docs > 0
    assert fresh.select("doc_id").distinct().count() == n_offset_docs
    store.write(fresh, mode="append")

    # the store now holds exactly old + fresh, and v1 is still intact
    assert store.read(spark).count() == n_chunks + n_fresh
    assert store.read(spark, 1).count() == n_chunks
    # the offset clones have identical text -> identical chunk hashes;
    # an exact chunk-level dedup on the full store rediscovers them
    dup_hashes = (
        store.read(spark)
        .groupBy("chunk_hash")
        .count()
        .where(F.col("count") >= 2)
        .count()
    )
    assert dup_hashes > 0
