"""Text analysis operators for training-data pipelines.

All pure Column expressions (whole-stage codegen, no Python, no
shuffle) — at 100 TB these run at parquet-scan speed. Determinism:
every fold over arrays is an ordered left-fold so results are
bit-identical across engines and partitionings.

Reference parity note: the reference's only text handling is JSON
decode and line join (``src/etlp/utils/reducers.clj:43-45``,
``README.md:31-32``); this module is the engine-added north-star
surface (SURVEY.md §7 M7).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_tokens",
    "avg_token_len",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "lang_scores",
    "lang_margin",
    "chunk_documents",
    "fingerprint",
    "winnow_fingerprints",
    "hashed_bigram_bucket",
    "dsir_scores",
    "LANG_MARKERS",
    "PUNCT_CLASS",
]

#: tiny per-language marker vocabularies for the n-gram/stopword
#: language-ID heuristic. Deliberately small — the point is the
#: scalable argmax-over-scores shape, not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is", "to"),
    "de": ("der", "und", "die", "ist", "nicht"),
    "es": ("el", "y", "los", "es", "que"),
    "fr": ("le", "et", "les", "est", "que"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}

PUNCT_CLASS = r"[.,!?;:()\[\]\"']"


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens, empties removed.

    Codegen-only on purpose: ``split`` on ``\\s+`` can only produce
    empty tokens at the two ENDS of the string (a run of whitespace
    in the middle is consumed whole), so stripping the ends first
    makes the empty-filter unnecessary — and dropping the
    ``F.filter`` lambda keeps this inside whole-stage codegen.
    Interpreted higher-order functions cost ~1µs per ELEMENT; on a
    token primitive that underlies a dozen operators that was the
    single largest cost in the text family (measured 2.6s of a 6.7s
    winnowing query at sf0.1 just to normalize tokens)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.lower(c), r"^\s+|\s+$", "")
    return F.when(F.length(stripped) == 0, F.array().cast("array<string>")).otherwise(
        F.split(stripped, r"\s+")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-flavored tokenization: runs of letters, runs of digits, or
    single punctuation marks — the standard pre-tokenizer split
    (regex, JVM-side), not a learned merge table."""
    c = F.col(col) if isinstance(col, str) else col
    # every alternative of the pattern matches ≥1 char, so extract_all
    # can't produce empties — no filter needed (stays in codegen)
    return F.regexp_extract_all(F.lower(c), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), 1)


def avg_token_len(col: Column | str, scale: int = 6) -> Column:
    """Mean token length; int sums so exact on any engine."""
    toks = tokens(col)
    # sum of token lengths == length of the empty-separator join —
    # one codegen'd expression instead of an interpreted fold
    total = F.length(F.array_join(toks, ""))
    return F.round(total.cast("double") / F.size(toks), scale)


def punct_ratio(col: Column | str, scale: int = 6) -> Column:
    """Fraction of characters that are punctuation (explicit class so
    every engine agrees on membership)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return F.round(n_punct.cast("double") / F.length(c), scale)


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count tokens that are in ``markers`` without an interpreted
    per-element lambda: join the tokens back with single spaces, pad,
    and count word-boundary regex matches (lookarounds are zero-width
    so adjacent marker tokens both match). Codegen'd regexp over a
    ~300-char string beats ~300 interpreted isin() evaluations by an
    order of magnitude. Markers must be regex-safe (ours are plain
    alphanumerics)."""
    padded = F.concat(F.lit(" "), F.array_join(toks, " "), F.lit(" "))
    pat = "(?<= )(?:" + "|".join(markers) + ")(?= )"
    return F.regexp_count(padded, F.lit(pat))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = LANG_MARKERS["en"], scale: int = 6) -> Column:
    toks = tokens(col)
    hits = _marker_hits(toks, stopwords)
    return F.round(hits.cast("double") / F.size(toks), scale)


def quality_score(col: Column | str, scale: int = 6) -> Column:
    """Composite document-quality heuristic in [0, 1]:

    0.4 · length_score  (saturating at 200 tokens)
    + 0.3 · (1 − punct_ratio)
    + 0.3 · stopword_presence  (saturating at 10%)

    The weights are arbitrary; the shape (cheap per-row expression →
    filter/sort at scan speed) is the point.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = token_count(c).cast("double")
    length_score = F.least(n / F.lit(200.0), F.lit(1.0))
    sw = stopword_ratio(c, scale=9)
    sw_score = F.least(sw * 10.0, F.lit(1.0))
    return F.round(0.4 * length_score + 0.3 * (1.0 - punct_ratio(c, scale=9)) + 0.3 * sw_score, scale)


def lang_id_from_scores(scores: Column) -> Column:
    """Argmax language from a ``lang_scores`` array: first-wins
    tie-break in LANG_MARKERS order (``array_position`` returns the
    FIRST index of the max, exactly the old when-chain's first
    matching branch), ``'und'`` when the scores are null (null
    text — the chain's unreachable-otherwise case). Taking the
    ARRAY lets callers that need both prediction and margin stage
    the 25-regexp score set once (see x62)."""
    names = F.array(*[F.lit(lang) for lang in LANG_MARKERS])
    return F.coalesce(
        F.element_at(
            names,
            F.array_position(scores, F.array_max(scores)).cast("int"),
        ),
        F.lit("und"),
    )


def lang_id(col: Column | str) -> Column:
    """Marker-token language ID: score each language by marker-token
    hits, pick the argmax (first-wins tie-break in LANG_MARKERS
    order). One codegen'd regexp count per language per row — no
    shuffle, no UDF, no interpreted lambdas. The argmax is
    ``array_position(scores, array_max(scores))`` over the score
    array rather than a ``when(w == greatest(*ws), lang)`` chain —
    the chain inlined every score expression into every branch
    (opt r17, the x132 finding)."""
    return lang_id_from_scores(lang_scores(col))


def lang_scores(col: Column | str) -> Column:
    """Per-language marker-hit scores as an int array in
    ``LANG_MARKERS`` order — the raw evidence behind ``lang_id``'s
    argmax, exposed so calibration/eval operators can reason about
    the score distribution, not just the winner. Same cost model as
    ``lang_id``: one codegen'd regexp count per language."""
    toks = tokens(col)
    return F.array(*[_marker_hits(toks, m) for m in LANG_MARKERS.values()])


def lang_margin_from_scores(scores: Column) -> Column:
    """``lang_margin`` from an already-computed score array — the
    staged-select companion of ``lang_id_from_scores``."""
    s = F.array_sort(scores)
    return F.element_at(s, -1) - F.element_at(s, -2)


def lang_margin(col: Column | str) -> Column:
    """Confidence margin of the language-ID decision: best minus
    second-best marker score (an exact integer — 0 means the argmax
    was a coin flip, large means unambiguous). The standard input to
    a classifier calibration curve."""
    return lang_margin_from_scores(lang_scores(col))


def chunk_documents(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 32,
    stride: int = 24,
    carry: tuple[str, ...] = (),
    with_text: bool = False,
):
    """RAG-style chunking operator: one output row per overlapping
    token window of each document — ``(id_col, chunk_idx, start_tok,
    chunk_len, chunk_hash)``. Chunk starts are the 1-based indexes
    ``1, 1+stride, …, 1+stride·⌈(n−size)/stride⌉`` — the last start
    CEIL-aligned so every token lands in at least one chunk (the
    floor-aligned rule silently drops up to stride−1 tail tokens
    whenever n−size isn't a stride multiple — a hypothesis test
    caught exactly that at n=3, size=2, stride=2). A short document
    yields exactly one (possibly short) chunk; the final window is
    never empty because ``stride ≤ size`` is enforced.

    Deliberately NOT an array-of-structs Column: building chunks
    inside ``F.transform`` would drop the slice/hash work into
    interpreted higher-order functions (~1µs per element — the
    anti-pattern the ``tokens`` docstring measures). The explode
    happens first so every per-chunk expression stays in whole-stage
    codegen, fused with the scan; no shuffle, no Python."""
    if stride > size or stride < 1:
        raise ValueError(
            f"stride must be in [1, size]: got stride={stride}, size={size} "
            "(a stride beyond the window gaps the coverage — that's "
            "sampling, not chunking)"
        )
    tk = tokens(text_col)
    # top start = 1 + stride * ceil(max(0, n - size) / stride): integer
    # ceil via (x + stride - 1) div stride; aligned by construction so
    # sequence() includes it exactly.
    n = F.size("__tk")
    k_max = F.floor(
        (F.greatest(F.lit(0), n - size) + F.lit(stride - 1)) / stride
    ).cast("int")
    starts = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry],
        tk.alias("__tk"),
    ).where(F.size("__tk") > 0).select(
        id_col,
        *carry,
        "__tk",
        F.explode(
            F.sequence(F.lit(1), F.lit(1) + k_max * stride, F.lit(stride))
        ).alias("__st"),
    )
    chunk = F.slice("__tk", F.col("__st"), F.lit(size))
    return starts.select(
        id_col,
        *carry,  # metadata carried through the fan-out, no join-back needed
        (F.floor((F.col("__st") - 1) / stride) + 1).cast("long").alias("chunk_idx"),
        F.col("__st").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("chunk_len"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        # chunk_text is opt-in: reconstruction-style consumers (x70)
        # need the tokens back; hash-only consumers shouldn't pay the
        # string materialization.
        *([F.concat_ws(" ", chunk).alias("chunk_text")] if with_text else []),
    )


def fingerprint(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of the
    whitespace-normalized, lowercased text. Identical normalization →
    identical fingerprint, so exact dedup is a groupBy on this."""
    return F.md5(F.array_join(tokens(col), " "))


def char_shingles(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of the normalized text (the char-
    level alternative to word shingles for near-dup detection — more
    robust to tokenization differences, denser per document).

    Built like word_shingles: split to a char array, take n shifted
    whole-array slices, zip them back with concat. Per-row cost is
    O(n·len) — the obvious substring-at-every-position form is
    O(len²) because substring on UTF8String re-scans for char
    boundaries from the front (measured ~30× slower at ~300-char
    docs; the gap widens with doc length).

    An Arrow-kernel form (the ``winnow_fingerprints`` §4.2
    treatment) was tried in the r17 optimization round and REJECTED
    by measurement: unlike winnowing's compact int64 hash arrays,
    the output here is ~len small STRINGS per row, and shipping 6M
    5-char strings back across the Arrow boundary cost more than the
    interpreted ``zip_with`` it saved (x13 exec 0.77 → 1.20 s at
    sf0.1, same session)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = F.array_join(tokens(c), " ")
    chars = F.split(norm, "")
    m = F.length(norm) - (n - 1)
    shifted = [F.slice(chars, i + 1, m) for i in range(n)]
    joined = shifted[0]
    for nxt in shifted[1:]:
        joined = F.zip_with(joined, nxt, lambda a, b: F.concat(a, b))
    return F.when(m < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(joined)
    )


#: Karp-Rabin base/modulus for winnowing k-gram hashes. P is prime,
#: ~1e9 so acc·B + code < 2^63 with room; both constants appear
#: verbatim in the DuckDB oracle.
WINNOW_B = 257
WINNOW_P = 1000000007


#: Lazily-built pandas_udf per (k, w) — pandas_udf registration needs
#: a live session, and one compiled kernel per parameter pair lets a
#: bench/service reuse it across queries.
_WINNOW_UDFS: dict = {}


def _winnow_udf(k: int, w: int):
    if (k, w) in _WINNOW_UDFS:
        return _WINNOW_UDFS[(k, w)]
    from pyspark.sql.functions import pandas_udf

    B, P, kw = WINNOW_B, WINNOW_P, k + w - 1

    @pandas_udf("array<bigint>")
    def _winnow(norms: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for s in norms:
            if s is None:
                out.append(None)
                continue
            if len(s) < kw:
                out.append([])
                continue
            # utf-32-le reinterpret = the code point of every char in
            # one vectorized step (== ord(c) per char, == JVM
            # ``ascii`` over ``split(norm, '')``).
            codes = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            m = codes.size - (k - 1)  # number of k-grams (positional)
            h = codes
            g = 1
            while g < k:  # doubling combine, log2(k) vector passes
                mult = pow(B, g, P)
                span = m + (k - 2 * g)
                h = (h[:span] * mult + h[g : g + span]) % P
                g *= 2
            nw = m - (w - 1)  # number of full windows
            mins = h
            g = 1
            while g < w:
                span = nw + (w - 2 * g)
                mins = np.minimum(mins[:span], mins[g : g + span])
                g *= 2
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    _WINNOW_UDFS[(k, w)] = _winnow
    return _winnow


def winnow_fingerprints(col: Column | str, k: int = 8, w: int = 4) -> Column:
    """Winnowing document fingerprint (the MOSS scheme): hash every
    char k-gram of the normalized text, slide a window of ``w``
    consecutive hashes, keep the minimum of each window, return the
    distinct selected hashes sorted.

    Guarantees of winnowing: any shared substring of length
    ≥ k + w - 1 between two documents contributes at least one common
    fingerprint, so fingerprint overlap lower-bounds substring-level
    plagiarism/near-dup — positional, unlike bag-of-shingles Jaccard.

    Normalization stays a codegen'd JVM expression (``tokens`` —
    identical semantics to every other text operator); the rolling
    hash + window minima run as a VECTORIZED Arrow kernel
    (``pandas_udf`` → numpy int64), not Column expressions. The
    expression form (k shifted slices + ``zip_with`` folds) was the
    r17 text-family hotspot: Spark evaluates higher-order-function
    lambdas INTERPRETED, per element — ~10M lambda evals at sf0.1 —
    where numpy does the same doubling combine in log2(k)+log2(w)
    vector ops per document (optimization guide §4.2). Arithmetic is
    bit-identical: code points via utf-32 reinterpret (== JVM
    ``ascii``), Karp-Rabin ``(a*mult + b) % P`` with every
    intermediate < P² ≈ 1e18 inside int64 in both engines, minima +
    sorted-distinct order-independent — enforced by the
    ``_py_winnow`` left-fold property test and the unchanged DuckDB
    oracle. Per-partition cost, zero shuffle, one ArrowEvalPython
    node carrying only the normalized string. Docs shorter than
    k + w - 1 normalized chars yield an empty fingerprint set."""
    if k & (k - 1) or w & (w - 1):
        raise ValueError("k and w must be powers of two (doubling combine)")
    c = F.col(col) if isinstance(col, str) else col
    norm = F.array_join(tokens(c), " ")
    return _winnow_udf(k, w)(norm)


def hashed_bigram_bucket(term: Column | str, buckets: int = 256) -> Column:
    """Feature-hash a term string into one of ``buckets`` buckets via
    the first 16 bits of its md5 — the hashing trick (Weinberger et
    al. 2009), md5-derived so a DuckDB oracle reproduces every bucket
    id bit-for-bit (Spark's ``hash()`` would not)."""
    c = F.col(term) if isinstance(term, str) else term
    return F.conv(F.substring(F.md5(c), 1, 4), 16, 10).cast("long") % buckets


def dsir_scores(
    df: DataFrame,
    text_col: str,
    is_target: Column,
    keys: tuple[str, ...] = ("doc_id",),
    buckets: int = 256,
) -> DataFrame:
    """Per-document DSIR importance scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"):
    ``w(doc) = sum_features [ln p_tgt(b) - ln p_src(b)]`` over hashed
    bigram features, add-one smoothed across ``buckets`` buckets,
    where the target distribution is estimated from the ``is_target``
    slice of ``df`` and the source distribution from all of ``df``.

    Returns ``keys`` + ``score_e6`` (the feature-summed log-ratio,
    e6-scaled) + ``n_feats``. Exactness discipline: each BUCKET's log
    weight is e6-floored to an integer FIRST, so every document's
    score is an integer SUM — order-free across engines and
    partitionings; the only float ops are the ``buckets`` ln() calls
    on identical doubles.

    Plan shape at 100 TB: feature hashing is scan-stage; both
    distributions aggregate to ``<= buckets`` rows (CONSTANT in
    corpus size — the hashing trick's point) so the score table
    always broadcasts; the one corpus-sized shuffle is the per-doc
    aggregate. The bigram frame is eagerly localCheckpointed because
    it has three consumers (target dist, source dist, join-back).
    """
    tk = df.select(*keys, is_target.alias("_tgt"), tokens(text_col).alias("tk"))
    m = F.size("tk") - 1
    bi = tk.select(
        *keys,
        "_tgt",
        F.explode(
            F.when(
                m >= 1,
                F.zip_with(
                    F.slice("tk", 1, F.greatest(m, F.lit(0))),
                    F.slice("tk", 2, F.greatest(m, F.lit(0))),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("term"),
    ).withColumn("b", hashed_bigram_bucket("term", buckets))
    bi = bi.localCheckpoint(eager=True)  # 2 consumers: dist, join-back
    # Perf (opt r17, guide §2.3 "aggregate before you shuffle"): the
    # target and source distributions used to be TWO aggregations
    # over bi plus a left join to align them; one aggregation now
    # carries both counts (tc = conditional count of the target
    # slice), removing a full pass over the bigram frame, one
    # shuffle, and the src-tgt join. A bucket with no target rows
    # gets tc = 0 — exactly what coalesce(tc, 0) produced before.
    dist = bi.groupBy("b").agg(
        F.count(F.lit(1)).alias("sc"),
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("tc"),
    )
    # A zero total target count means is_target matched NOTHING — a
    # mis-specified predicate must fail loudly instead of silently
    # producing the degenerate all-source distribution (in-plan, so
    # no extra driver-side action is spent on the check)
    nt = dist.agg(
        F.when(
            F.coalesce(F.sum("tc"), F.lit(0)) == 0,
            F.raise_error(
                F.lit(
                    "dsir_scores: is_target matched zero rows — the "
                    "target distribution is empty; check the predicate"
                )
            ).cast("long"),
        )
        .otherwise(F.sum("tc"))
        .alias("t_total")
    )
    ns = dist.agg(F.sum("sc").alias("s_total"))
    lscore = (
        dist.join(F.broadcast(nt))
        .join(F.broadcast(ns))
        .select(
            "b",
            (
                F.floor(
                    1000000.0
                    * F.log(
                        (F.col("tc") + 1.0)
                        / (F.col("t_total") + buckets)
                    )
                )
                - F.floor(
                    1000000.0
                    * F.log((F.col("sc") + 1.0) / (F.col("s_total") + buckets))
                )
            ).cast("long").alias("w_e6"),
        )
    )
    return (
        bi.join(F.broadcast(lscore), "b")  # <= buckets rows: always broadcast
        .groupBy(*keys)
        .agg(
            F.sum("w_e6").cast("long").alias("score_e6"),
            F.count(F.lit(1)).cast("long").alias("n_feats"),
        )
    )
