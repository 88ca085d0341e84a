"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard (SURVEY.md §7 M7; engine-added — the reference has no dedup).

Scale design (100 TB of documents):

- **Exact**: one shuffle on the 16-byte fingerprint; skew-safe (a
  hash key is uniform by construction).
- **MinHash-LSH**: the expensive relation is (doc, shingle) after
  explode — it is pipelined with the scan; the signature is computed
  by ONE hash-aggregate (k mins in a single shuffle). Banding turns
  the quadratic all-pairs problem into a self-join on band keys whose
  fan-out is bounded by bucket size; a bucket-size cap (``max_bucket``)
  guards against degenerate buckets (the classic LSH skew pathology).
- **SimHash**: per-document only (no join) — one ordered fold over
  the token array per row, emitting a 32-bit signature; near-dup
  candidates come from banding the signature bits exactly like
  MinHash.

Hash discipline: all hashing is md5-derived (not Spark's ``hash()``)
so results are engine-portable — the DuckDB oracles reproduce every
stage bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from etlp_spark.functions.text import fingerprint, tokens

__all__ = [
    "exact_dedup",
    "word_shingles",
    "minhash_signature",
    "lsh_candidates",
    "jaccard_pairs",
    "simhash32",
]


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per identical normalized text.

    Returns (fingerprint, keeper id, group size). One shuffle.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_dups"))
    )


def word_shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized token stream.

    Built with sequence+transform+slice — pure JVM array ops.
    """
    toks = tokens(text_col)
    # NB: Spark's sequence(1, stop) runs DESCENDING when stop < 1, so
    # short documents need an explicit empty-array guard.
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def _minhash_component(shingle_col: Column, seed: int) -> Column:
    """One MinHash component: lexicographic min of md5(seed|shingle).

    md5 output is uniform, so the lexicographic min over hex strings
    is a valid min-wise hash; using k distinct seeds gives k
    independent permutation approximations — and both engines produce
    identical hex, so oracles reproduce it exactly.
    """
    return F.min(F.md5(F.concat(F.lit(f"{seed}|"), shingle_col)))


def minhash_signature(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 16, n: int = 3
) -> DataFrame:
    """(id, sig_0..sig_{k-1}): explode shingles once, aggregate k mins
    in a single hash-aggregate (one shuffle total)."""
    exploded = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, n)).alias("sh")
    ).where(F.col("sh") != "")
    aggs = [_minhash_component(F.col("sh"), i).alias(f"sig_{i}") for i in range(k)]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidates(
    sig_df: DataFrame, id_col: str = "doc_id", k: int = 16, bands: int = 4, max_bucket: int = 50
) -> DataFrame:
    """Band the signature, self-join on band keys → candidate pairs
    (a < b) with the estimated Jaccard = fraction of equal signature
    components.

    ``max_bucket`` drops degenerate buckets (boilerplate documents
    collapse into huge buckets whose pair fan-out is quadratic — at
    scale you cap them and route to a dedicated path).
    """
    rows = bands_rows = k // bands
    band_keys = [
        F.md5(F.concat_ws("|", *[F.col(f"sig_{b * bands_rows + r}") for r in range(rows)])).alias(
            f"band_{b}"
        )
        for b in range(bands)
    ]
    banded = sig_df.select(id_col, *[F.col(f"sig_{i}") for i in range(k)], *band_keys)

    pieces = []
    for b in range(bands):
        e = banded.select(F.col(id_col), F.col(f"band_{b}").alias("bucket"))
        # cap bucket size before the self-join (skew guard)
        sized = e.groupBy("bucket").agg(
            F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("sz")
        )
        pieces.append(sized.where(F.col("sz") <= max_bucket).select("bucket", "ids"))
    buckets = pieces[0]
    for p in pieces[1:]:
        buckets = buckets.unionByName(p)

    pairs = (
        buckets.select(F.explode(F.col("ids")).alias("a"), F.col("ids"))
        .select("a", F.explode(F.col("ids")).alias("b"))
        .where(F.col("a") < F.col("b"))
        .distinct()
    )

    sig_a = sig_df.select(
        F.col(id_col).alias("a"), *[F.col(f"sig_{i}").alias(f"sa_{i}") for i in range(k)]
    )
    sig_b = sig_df.select(
        F.col(id_col).alias("b"), *[F.col(f"sig_{i}").alias(f"sb_{i}") for i in range(k)]
    )
    est = None
    for i in range(k):
        term = F.when(F.col(f"sa_{i}") == F.col(f"sb_{i}"), 1).otherwise(0)
        est = term if est is None else est + term
    return (
        pairs.join(sig_a, "a").join(sig_b, "b")
        .select("a", "b", F.round(est / F.lit(float(k)), 6).alias("est_jaccard"))
    )


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs (the verify step
    after LSH blocking). Set sizes are ints → exact on any engine."""
    sh = df.select(
        F.col(id_col), word_shingles(text_col, n).alias("sh"), F.size(word_shingles(text_col, n)).alias("sz")
    )
    a = sh.select(F.col(id_col).alias("a"), F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a"))
    b = sh.select(F.col(id_col).alias("b"), F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        pairs.join(a, "a").join(b, "b")
        .select(
            "a",
            "b",
            F.round(inter.cast("double") / (F.col("sz_a") + F.col("sz_b") - inter), 6).alias(
                "jaccard"
            ),
        )
    )


def simhash32(text_col: str) -> Column:
    """32-bit SimHash of the token stream.

    Per token, a 32-bit md5-derived hash votes ±1 on each bit; the
    signature sets bits with positive tallies. Single ordered fold
    per row (aggregate over the token array) — no shuffle, no UDF,
    and md5-based so the oracle reproduces it.
    """
    toks = tokens(text_col)
    # per-token 32-bit int from the first 8 hex chars of md5
    tok_hash = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")  # noqa: E731

    def _pow2(i):  # 2^i as exact long (shift ops need literal ints,
        return F.pow(F.lit(2.0), i.cast("double")).cast("long")  # lambda vars are Columns)

    def _bit(h, i):  # (h >> i) & 1 — exact: h < 2^32, power-of-two division
        return (h / _pow2(i).cast("double")).cast("long") % 2

    tallies = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), 32),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(31)),
                lambda i: F.when(_bit(tok_hash(t), i) == 1, 1).otherwise(-1),
            ),
            lambda a, v: a + v,
        ),
    )
    return F.aggregate(
        F.zip_with(
            tallies,
            F.sequence(F.lit(0), F.lit(31)),
            lambda tally, i: F.when(tally > 0, _pow2(i)).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
