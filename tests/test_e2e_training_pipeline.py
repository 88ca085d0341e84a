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


def test_curation_health_report_and_layout(spark, docs, tmp_path):
    """The round-8 surfaces composed as the pipeline's OBSERVABILITY
    and LAYOUT layer — what an operator runs beside the curation flow:

        HLL sketch audit (distinct-token estimate vs exact, per
        source) → cross-source overlap matrix (dedup-budget planning)
        → zone-mapped snapshot write sorted by doc_id →
        range-pruned incremental read

    Pins: the sketch estimate lands within the p=8 analytic bound of
    the exact count it audits; the overlap matrix is symmetric-free
    (each unordered pair once) with sane Jaccards; the zone-mapped
    store prunes files on a doc_id range while returning exactly the
    rows a full scan filters to."""
    from etlp_spark.functions.sketches import hll_estimate, hll_registers
    from etlp_spark.functions.text import tokens

    toks = docs.select("source", F.explode(tokens("text")).alias("t"))
    est = {
        r.source: r.est_e6 / 1e6
        for r in hll_estimate(
            hll_registers(toks, "t", keys=("source",)), keys=("source",)
        ).collect()
    }
    exact = {
        r.source: r.n
        for r in toks.groupBy("source").agg(
            F.countDistinct("t").alias("n")
        ).collect()
    }
    assert set(est) == set(exact)
    for s in exact:
        assert abs(est[s] - exact[s]) / exact[s] < 0.2, (s, est[s], exact[s])

    # overlap matrix: every unordered source pair exactly once,
    # jaccard in [0, 1e6], n_inter <= n_union
    from etlp_spark.queries import QUERIES

    mat = QUERIES["x98_source_overlap_matrix"].fn(spark, SF).collect()
    n_src = docs.select("source").distinct().count()
    assert len(mat) == n_src * (n_src - 1) // 2
    for r in mat:
        assert r.src_a < r.src_b
        assert 0 <= r.n_inter <= r.n_union
        assert 0 <= r.jaccard_e6 <= 1_000_000

    # zone-mapped store: sort by doc_id so zones are tight, then a
    # pruned ranged read returns exactly the filtered rows while
    # reading fewer files
    from etlp_spark.connectors.snapshots import SnapshotStore

    store = SnapshotStore(str(tmp_path / "zoned"))
    store.write(
        docs.repartitionByRange(4, "doc_id"), stats_cols=("doc_id",)
    )
    lo, hi = 100, 160
    pruned, info = store.read_pruned(spark, {"doc_id": (lo, hi)})
    want = sorted(
        r.doc_id for r in docs.where(F.col("doc_id").between(lo, hi)).collect()
    )
    assert sorted(r.doc_id for r in pruned.collect()) == want
    assert info["files_read"] < info["files_total"]


def test_experiment_readout_suite_is_consistent(spark):
    """The experimentation suite composed end-to-end the way an
    analysis would run it — design (x131 power), guardrails (x101
    SRM), readouts (x130 Welch, x116 bootstrap), aggregation-bias
    check (x124 Simpson) — pinning the CROSS-OPERATOR consistency
    relations each query's own oracle cannot see:

    - every operator sees the SAME cohort split, so per-stratum arm
      counts must agree exactly across x124 and x130, and x131's
      available traffic must equal their sum;
    - the bootstrap CI must contain its own point estimate;
    - the SRM guardrail must pass on a parity split (it gates the
      others: a flagged split would invalidate every readout)."""
    from etlp_spark.functions.stats import srm_chi2
    from etlp_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    welch = {r.event_type: r for r in QUERIES["x130_welch_ttest"].fn(spark, sf).collect()}
    simpson = {r.event_type: r for r in QUERIES["x124_simpson_reversal"].fn(spark, sf).collect()}
    power = {r.event_type: r for r in QUERIES["x131_power_mde"].fn(spark, sf).collect()}
    assert set(welch) == set(simpson) == set(power)
    for t in welch:
        assert (welch[t].n_a, welch[t].n_b) == (simpson[t].n_a, simpson[t].n_b)
        assert power[t].n_avail == welch[t].n_a + welch[t].n_b
        assert simpson[t].reversal_flag in (0, 1)

    boot = QUERIES["x116_poisson_bootstrap"].fn(spark, sf).collect()
    assert boot
    for r in boot:
        assert r.boot_lo_cents <= r.est_cents <= r.boot_hi_cents, r
        assert r.ci_width_cents > 0

    # SRM runs over assignment UNITS (distinct users), not event rows:
    # per-event counting double-weights heavy users and flags traffic
    # imbalance that is NOT an assignment bug — exactly the mistake
    # the srm_chi2 docstring warns about, demonstrated both ways here.
    ev = io.load_table(spark, sf, "events")
    units = ev.select("user_id").distinct().select(
        (F.col("user_id") % 2).cast("int").alias("arm")
    )
    srm = srm_chi2(units).collect()[0]
    assert srm.srm_flag is False  # parity split passes at the unit level
    rows_as_units = ev.select((F.col("user_id") % 2).cast("int").alias("arm"))
    assert srm_chi2(rows_as_units).collect()[0].srm_flag is True
