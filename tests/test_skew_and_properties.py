"""Skew-handling ops + hypothesis property tests for core operators."""

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from etlp_spark.ops import salted_agg, salted_join
from etlp_spark.ops_temporal import as_of_join


def test_salted_agg_matches_plain(spark):
    rows = [("hot", float(i % 7)) for i in range(5000)] + [(f"k{i}", 1.0) for i in range(50)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {(r.k): (r.n, r.s) for r in df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()}
    salted = {(r.k): (r.n, r.sum_v) for r in salted_agg(df, ["k"], sum_cols=["v"]).collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(1000)] + [("cold", 1)], "k string, lv long"
    )
    right = spark.createDataFrame([("hot", 10), ("cold", 20), ("miss", 30)], "k string, rv long")
    plain = sorted((r.k, r.lv, r.rv) for r in left.join(right, "k").collect())
    salted = sorted((r.k, r.lv, r.rv) for r in salted_join(left, right, "k").collect())
    assert salted == plain


# ---------------------------------------------------------------------
# property tests: the Spark as-of join against a pure-Python reference
# ---------------------------------------------------------------------

def _py_asof(left, right, strict):
    out = {}
    for lid, key, lts in left:
        best = None
        for rid, rkey, rts, val in right:
            if rkey != key:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if best is None or (rts, rid) > (best[0], best[1]):
                    best = (rts, rid, val)
        out[lid] = None if best is None else best[2]
    return out


ts_strategy = st.integers(min_value=0, max_value=50).map(
    lambda s: dt.datetime(2024, 1, 1) + dt.timedelta(minutes=s)
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 3), ts_strategy),
                  min_size=1, max_size=8, unique_by=lambda t: t[0]),
    right=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 3), ts_strategy,
                             st.floats(allow_nan=False, allow_infinity=False, width=32)),
                   min_size=0, max_size=8, unique_by=lambda t: t[0]),
    strict=st.booleans(),
)
def test_asof_join_matches_python_reference(spark, left, right, strict):
    ldf = spark.createDataFrame(left, "lid long, key long, lts timestamp")
    rdf = spark.createDataFrame(
        right, "rid long, key long, rts timestamp, val double"
    ) if right else spark.createDataFrame([], "rid long, key long, rts timestamp, val double")
    got = {
        r.lid: r.val_asof
        for r in as_of_join(ldf, rdf, "key", "lts", "rts", ["val"], tiebreak="rid",
                            strict=strict).collect()
    }
    assert got == _py_asof(left, right, strict)


# ---------------------------------------------------------------------
# property test: exact Jaccard from the pipeline == set-math Jaccard
# ---------------------------------------------------------------------

words = st.sampled_from(["a", "b", "c", "d", "e", "f"])
texts = st.lists(words, min_size=3, max_size=12).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(t1=texts, t2=texts)
def test_jaccard_matches_set_math(spark, t1, t2):
    from etlp_spark.functions.dedup import jaccard_pairs

    def shingles(t):
        toks = t.split()
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    docs = spark.createDataFrame([(1, t1), (2, t2)], ["doc_id", "text"])
    pairs = spark.createDataFrame([(1, 2)], ["a", "b"])
    got = jaccard_pairs(docs, pairs).first().jaccard
    s1, s2 = shingles(t1), shingles(t2)
    expected = round(len(s1 & s2) / len(s1 | s2), 6)
    assert got == expected


def test_apply_grouped_matches_expression_slope(spark, sf_dir):
    """The applyInPandas group-map escape hatch computes the same
    slope as the exact decimal-sums expression form (w4)."""
    import pandas as pd

    from etlp_spark.ops import apply_grouped
    from etlp_spark.queries import QUERIES

    def slope_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["ts"].astype("int64") / 1e9
        y = pdf["value"]
        n = len(pdf)
        sx, sy, sxy, sxx = x.sum(), y.sum(), (x * y).sum(), (x * x).sum()
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]],
             "slope": [round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)]}
        )

    from etlp_spark.io import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    pandas_slopes = {
        r.user_id: r.slope
        for r in apply_grouped(ev, ["user_id"], slope_fn, "user_id long, slope double").collect()
    }
    expr_slopes = {
        r.user_id: round(r.slope, 6)
        for r in QUERIES["w4_per_user_trend"].fn(spark, sf_dir).collect()
    }
    assert set(pandas_slopes) == set(expr_slopes)
    for u in expr_slopes:
        assert abs(pandas_slopes[u] - expr_slopes[u]) < 1e-4


def test_sequence_packing_invariants(spark, sf_dir):
    """x23 invariants on a synthetic corpus: within every shard,
    positions ordered by doc_id have nondecreasing seq_ids; every
    sequence's token total stays under budget + the straddling doc;
    and seq_id 0 starts each shard."""
    from etlp_spark.queries import QUERIES

    out = QUERIES["x23_sequence_packing"].fn(spark, sf_dir).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    budget = 2048
    for shard, rows in by_shard.items():
        seqs = [r.seq_id for r in rows]
        assert seqs[0] == 0, f"shard {shard} must start at seq 0"
        assert all(a <= b for a, b in zip(seqs, seqs[1:])), "seq ids nondecreasing"
        cum = 0
        for r in rows:
            assert r.seq_id == cum // budget  # start-position assignment
            cum += r.n_tok


def test_shuffle_shard_is_permutation(spark, sf_dir):
    """x26: positions within each shard are exactly 1..n (a true
    permutation — no gaps, no dups), and the layout is reproducible."""
    from etlp_spark.queries import QUERIES

    a = QUERIES["x26_shuffle_shard"].fn(spark, sf_dir).collect()
    b = QUERIES["x26_shuffle_shard"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    by_shard: dict[int, list[int]] = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1))


# ---------------------------------------------------------------------
# property test: forward as-of (+tolerance) == python reference
# ---------------------------------------------------------------------

def _py_asof_fwd(left, right, strict, tol):
    out = {}
    for lid, key, lts in left:
        best = None
        for rid, rkey, rts, val in right:
            if rkey != key:
                continue
            if (rts > lts) if strict else (rts >= lts):
                if best is None or (rts, rid) < (best[0], best[1]):
                    best = (rts, rid, val)
        if best is not None and tol is not None:
            if (best[0] - lts).total_seconds() > tol:
                best = None
        out[lid] = None if best is None else best[2]
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 3), ts_strategy),
                  min_size=1, max_size=8, unique_by=lambda t: t[0]),
    right=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 3), ts_strategy,
                             st.floats(allow_nan=False, allow_infinity=False, width=32)),
                   min_size=0, max_size=8, unique_by=lambda t: t[0]),
    strict=st.booleans(),
    tol=st.sampled_from([None, 0, 600, 1800]),
)
def test_asof_forward_matches_python_reference(spark, left, right, strict, tol):
    ldf = spark.createDataFrame(left, "lid long, key long, lts timestamp")
    rdf = spark.createDataFrame(
        right, "rid long, key long, rts timestamp, val double"
    ) if right else spark.createDataFrame([], "rid long, key long, rts timestamp, val double")
    got = {
        r.lid: r.val_asof
        for r in as_of_join(ldf, rdf, "key", "lts", "rts", ["val"], tiebreak="rid",
                            strict=strict, direction="forward",
                            tolerance_seconds=tol).collect()
    }
    assert got == _py_asof_fwd(left, right, strict, tol)


# ---------------------------------------------------------------------
# property test: nearest as-of (+tolerance) == python reference
# ---------------------------------------------------------------------

def _py_asof_nearest(left, right, strict, tol):
    out = {}
    for lid, key, lts in left:
        bb = None  # backward best: max (rts, rid)
        fb = None  # forward best: min (rts, rid)
        for rid, rkey, rts, val in right:
            if rkey != key:
                continue
            if (rts < lts) if strict else (rts <= lts):
                if bb is None or (rts, rid) > (bb[0], bb[1]):
                    bb = (rts, rid, val)
            if (rts > lts) if strict else (rts >= lts):
                if fb is None or (rts, rid) < (fb[0], fb[1]):
                    fb = (rts, rid, val)
        if tol is not None:
            if bb is not None and (lts - bb[0]).total_seconds() > tol:
                bb = None
            if fb is not None and (fb[0] - lts).total_seconds() > tol:
                fb = None
        if bb is not None and fb is not None:
            out[lid] = bb[2] if (lts - bb[0]) <= (fb[0] - lts) else fb[2]
        else:
            out[lid] = (bb or fb)[2] if (bb or fb) else None
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    left=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 3), ts_strategy),
                  min_size=1, max_size=8, unique_by=lambda t: t[0]),
    right=st.lists(st.tuples(st.integers(0, 10**6), st.integers(0, 3), ts_strategy,
                             st.floats(allow_nan=False, allow_infinity=False, width=32)),
                   min_size=0, max_size=8, unique_by=lambda t: t[0]),
    strict=st.booleans(),
    tol=st.sampled_from([None, 0, 600, 1800]),
)
def test_asof_nearest_matches_python_reference(spark, left, right, strict, tol):
    ldf = spark.createDataFrame(left, "lid long, key long, lts timestamp")
    rdf = spark.createDataFrame(
        right, "rid long, key long, rts timestamp, val double"
    ) if right else spark.createDataFrame([], "rid long, key long, rts timestamp, val double")
    got = {
        r.lid: r.val_asof
        for r in as_of_join(ldf, rdf, "key", "lts", "rts", ["val"], tiebreak="rid",
                            strict=strict, direction="nearest",
                            tolerance_seconds=tol).collect()
    }
    assert got == _py_asof_nearest(left, right, strict, tol)


# ---------------------------------------------------------------------
# property test: winnow doubling combine == naive left-fold reference
# ---------------------------------------------------------------------

def _py_winnow(text, k=8, w=4, B=257, P=1000000007):
    toks = [t for t in text.lower().split() if t]
    norm = " ".join(toks)
    if len(norm) < k + w - 1:
        return []
    codes = [ord(c) for c in norm]
    hashes = []
    for i in range(len(codes) - k + 1):
        h = 0
        for c in codes[i:i + k]:
            h = (h * B + c) % P
        hashes.append(h)
    mins = [min(hashes[i:i + w]) for i in range(len(hashes) - w + 1)]
    return sorted(set(mins))


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(text=st.lists(st.sampled_from(["ab", "cde", "fg hi", "jj", "k"]),
                     min_size=0, max_size=12).map(" ".join))
def test_winnow_doubling_matches_left_fold(spark, text):
    from etlp_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(winnow_fingerprints("text", k=8, w=4).alias("fp")).collect()[0].fp
    assert list(got) == _py_winnow(text)


# ---------------------------------------------------------------------
# property test: chunk_documents invariants vs a pure-Python reference
# ---------------------------------------------------------------------

@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_tokens=st.integers(min_value=0, max_value=120),
    size_stride=st.integers(min_value=2, max_value=40).flatmap(
        lambda size: st.tuples(st.just(size), st.integers(min_value=1, max_value=size))
    ),
)
def test_chunk_documents_matches_python_reference(spark, n_tokens, size_stride):
    """For ANY (doc length, size, stride ≤ size): starts are 1,
    1+stride, …, 1+stride·⌈(n−size)/stride⌉; chunk lengths are
    min(size, n-start+1) and never 0; the union of chunks covers
    EVERY token index (the invariant that caught the floor-aligned
    tail-drop bug at n=3, size=2, stride=2); consecutive chunks
    overlap by ≥ size−stride."""
    from etlp_spark.functions.text import chunk_documents

    size, stride = size_stride
    toks = [f"w{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, size=size, stride=stride).collect(),
        key=lambda r: r.chunk_idx,
    )
    if n_tokens == 0:
        assert rows == []
        return
    k_max = (max(0, n_tokens - size) + stride - 1) // stride
    exp_starts = [1 + stride * k for k in range(k_max + 1)]
    assert [r.start_tok for r in rows] == exp_starts
    assert [r.chunk_idx for r in rows] == list(range(1, len(exp_starts) + 1))
    assert [r.chunk_len for r in rows] == [
        min(size, n_tokens - s + 1) for s in exp_starts
    ]
    assert all(r.chunk_len >= 1 for r in rows)
    covered = set()
    for r in rows:
        covered.update(range(r.start_tok, r.start_tok + r.chunk_len))
    assert covered == set(range(1, n_tokens + 1))


def test_chunk_documents_rejects_gapping_stride(spark):
    from etlp_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, size=4, stride=5)


# ---------------------------------------------------------------------
# round-5 property tests: Luhn, PQ argmin, count-min bound, segment
# dedup conservation — each new operator against an independent
# pure-Python / numpy reference
# ---------------------------------------------------------------------


def _py_luhn(num: int, width: int = 12) -> bool:
    s = 0
    for p in range(1, width + 1):
        d = (num // 10 ** (p - 1)) % 10
        if p % 2 == 0:
            d *= 2
            if d > 9:
                d -= 9
        s += d
    return s % 10 == 0


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(nums=st.lists(st.integers(min_value=0, max_value=999999999999),
                     min_size=1, max_size=30))
def test_luhn_matches_python_reference(spark, nums):
    """x72's expression-level Luhn against a textbook digit-loop
    implementation (which also cross-checks real card test numbers)."""
    from etlp_spark.queries import luhn_valid

    df = spark.createDataFrame([(n,) for n in nums], "num long")
    got = [
        (r.num, r.ok)
        for r in df.select("num", luhn_valid(F.col("num")).alias("ok")).collect()
    ]
    for n, ok in got:
        assert ok == _py_luhn(n), n


def test_luhn_known_vectors(spark):
    """Canonical Luhn test vectors (zero-padded to 12 digits)."""
    # 4111111111111111 % 1e12 etc. — use classic short numbers instead
    assert _py_luhn(79927398713)        # the Wikipedia example
    assert not _py_luhn(79927398710)
    assert not _py_luhn(79927398711)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seed=st.integers(min_value=0, max_value=10_000))
def test_pq_codes_match_numpy_argmin(spark, seed):
    """similarity.pq_codes against numpy: same codes, same (to 1e-9)
    reconstruction error, on random vectors and random codebooks."""
    import numpy as np

    from etlp_spark.functions.similarity import pq_codes

    rng = np.random.default_rng(seed)
    m, k, sub = 2, 4, 4
    books = [[list(map(float, rng.normal(size=sub))) for _ in range(k)]
             for _ in range(m)]
    vecs = rng.normal(size=(6, m * sub)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in pq_codes(df, books).collect()}
    for i, v in enumerate(vecs):
        err = 0.0
        for s in range(m):
            d2 = [sum((float(v[s * sub + d]) - books[s][c][d]) ** 2
                      for d in range(sub)) for c in range(k)]
            code = int(np.argmin(d2))
            assert rows[i][f"code_{s}"] == code, (i, s)
            err += min(d2)
        assert abs(rows[i].recon_err - err) < 1e-9


def test_countmin_never_undercounts(spark, sf_dir):
    """The CMS guarantee, asserted on the OPERATOR's output (an
    earlier version of this test re-implemented the sketch in Python
    and only tested itself): every x69 row's estimate is >= its exact
    count, and the exact counts agree with an independent Spark
    recount of those words."""
    import __spark_entry__ as entry

    from etlp_spark.functions.text import tokens
    from etlp_spark.io import load_table

    rows = entry.queries()["x69_countmin_heavyhitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.n_est >= r.n_exact for r in rows)
    assert all(r.overcount == r.n_est - r.n_exact for r in rows)
    # independent recount of the reported words
    docs = load_table(spark, sf_dir, "documents")
    words = {r.word for r in rows}
    counts = {
        r.word: r.c
        for r in docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word").isin(*words))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    for r in rows:
        assert counts[r.word] == r.n_exact, r.word


def test_segment_dedup_conservation(spark, sf_dir):
    """x70 invariants: n_kept <= n_total per doc; total kept across
    the corpus == number of DISTINCT segments (each distinct segment
    is kept exactly once); fully-novel docs keep everything."""
    import __spark_entry__ as entry

    df = entry.queries()["x70_segment_dedup"](spark, sf_dir)
    rows = df.collect()
    assert all(r.n_kept <= r.n_total for r in rows)
    total_kept = sum(r.n_kept for r in rows)

    from etlp_spark.functions.text import chunk_documents
    from etlp_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, size=16, stride=16)
    n_distinct = chunks.select("chunk_hash").distinct().count()
    assert total_kept == n_distinct


def test_pagerank_mass_nearly_conserved(spark, sf_dir):
    """r2 invariant: with no dangling nodes the e12-scaled ranks sum
    to ~1e12 (shortfall only from truncating divisions — bounded by
    a few units per division per node per iteration)."""
    import __spark_entry__ as entry

    rows = entry.queries()["r2_pagerank_int"](spark, sf_dir).collect()
    total = sum(r.rank_e12 for r in rows)
    assert len(rows) == 5
    # 5 nodes × 3 iterations × (a couple of floors) — generous bound
    assert 1_000_000_000_000 - 1000 <= total <= 1_000_000_000_000


def test_weighted_reservoir_biases_toward_weight(spark, sf_dir):
    """x85 A-Res sanity: exactly k rows, no duplicates, and the
    sample's mean weight exceeds the corpus mean (the whole point of
    weighting by length)."""
    import __spark_entry__ as entry

    from etlp_spark.io import load_table

    rows = entry.queries()["x85_weighted_reservoir"](spark, sf_dir).collect()
    assert len(rows) == 100
    assert len({r.doc_id for r in rows}) == 100
    sample_mean = sum(r.wt for r in rows) / len(rows)
    docs = load_table(spark, sf_dir, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean


def test_x100_bounded_peel_reaches_fixpoint_at_test_scale(spark):
    """x100 fixes peeling at 3 rounds so it unrolls to SQL in both
    engines — this is only honest if 3 rounds reach the k-core
    FIXPOINT on the data the gate checks. A 4th peel must be a no-op:
    identical (user_id, deg) sets."""
    from etlp_spark.queries import x100_kcore_membership

    sf = "/root/testdata/sf0.01"
    r3 = {(r.user_id, r.deg) for r in x100_kcore_membership(spark, sf).collect()}
    r4 = {
        (r.user_id, r.deg)
        for r in x100_kcore_membership(spark, sf, rounds=4).collect()
    }
    assert r3 == r4
    assert len(r3) > 0


@given(
    st.lists(st.text(min_size=1, max_size=20), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=300),
)
@settings(max_examples=60, deadline=None)
def test_hll_python_twin_properties(vals, split):
    """Pure-Python HLL twin properties under hypothesis (the Spark
    parity is pinned separately on fixed data): (1) merge by
    element-wise max over ANY partition of the values equals the
    registers of the whole set; (2) the estimate depends only on the
    distinct set (duplicates are invisible); (3) registers only grow
    under more data (monotone)."""
    from etlp_spark.functions.sketches import py_hll_estimate, py_hll_update

    split = min(split, len(vals))
    whole: dict[int, int] = {}
    py_hll_update(vals, whole)
    ra: dict[int, int] = {}
    rb: dict[int, int] = {}
    py_hll_update(vals[:split], ra)
    py_hll_update(vals[split:], rb)
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == whole

    dup: dict[int, int] = {}
    py_hll_update(vals * 3, dup)
    assert dup == whole
    assert py_hll_estimate(dup) == py_hll_estimate(whole)

    assert all(whole.get(k, 0) >= v for k, v in ra.items())


@given(st.floats(min_value=1e-6, max_value=1e12), st.floats(min_value=0.005, max_value=0.05))
@settings(max_examples=200, deadline=None)
def test_ddsketch_bucket_midpoint_relative_error(v, alpha):
    """DDSketch's defining invariant, property-tested: for ANY
    positive value and alpha, the midpoint of the bucket the value
    lands in is within relative error alpha of the value itself —
    this is the per-value guarantee the quantile bound inherits."""
    import math

    from etlp_spark.functions.sketches import dd_gamma

    g = dd_gamma(alpha)
    b = math.ceil(math.log(v) / math.log(g))
    est = 2.0 * (g ** b) / (g + 1.0)
    assert abs(est - v) / v <= alpha * 1.0000001, (v, alpha, est)


def test_x106_waterfill_rounds_converge(spark):
    """x106 fixes redistribution at 3 rounds so it unrolls to SQL —
    honest only if a 4th round changes nothing at the gate's scale,
    and the allocation must respect its own invariants: alloc <= cap
    everywhere, budget conservation (sum(alloc) + leftover == 1.5x
    corpus), and capped sources sit exactly at 2x avail."""
    from etlp_spark.queries import x106_mixture_allocation

    sf = "/root/testdata/sf0.01"
    r3 = sorted(
        tuple(r) for r in x106_mixture_allocation(spark, sf).collect()
    )
    r4 = sorted(
        tuple(r) for r in x106_mixture_allocation(spark, sf, rounds=4).collect()
    )
    assert r3 == r4
    total = sum(r[1] for r in r3)
    assert sum(r[3] for r in r3) + r3[0][6] == (3 * total) // 2
    for _, avail, _, alloc, _, capped, _ in r3:
        assert alloc <= 2 * avail
        if capped:
            assert alloc == 2 * avail


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=0,
        max_size=40,
    ),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kcore_invariant_random_graphs(spark, raw_edges, k):
    """k-core peeling on random graphs: run rounds until a fixpoint
    (edge count stable), then EVERY surviving node must have degree
    >= k within the surviving subgraph, and the result must equal a
    driver-side reference peel of the same edge set."""
    from etlp_spark.functions.graph import degrees, kcore

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges})
    # driver-side reference peel
    ref = set(edges)
    while True:
        deg: dict[int, int] = {}
        for a, b in ref:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nxt = {(a, b) for a, b in ref if deg[a] >= k and deg[b] >= k}
        if nxt == ref:
            break
        ref = nxt
    if not edges:
        return
    df = spark.createDataFrame(edges, "a int, b int")
    # 16 nodes -> at most 16 peel rounds to the fixpoint
    got = {(r.a, r.b) for r in kcore(df, k=k, rounds=16).collect()}
    assert got == ref
    if ref:
        core_deg = {r.v: r.d for r in degrees(kcore(df, k=k, rounds=16)).collect()}
        assert all(d >= k for d in core_deg.values())


@given(
    st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 30)),
        min_size=0,
        max_size=120,
    ),
    st.integers(min_value=2, max_value=6),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_cooccurrence_bucket_cap_drops_hubs(spark, pres_pairs, cap, min_shared):
    """The bucket cap is the load-bearing skew guard of the whole
    graph family (x92 triangles, x100 k-core, x107 pagerank all build
    edges through it) — property-pinned (r8 verdict #6): (1) the edge
    list equals a driver-side reference that enumerates pairs ONLY in
    buckets of size 2..cap; (2) adding a deliberately GIANT bucket
    (size cap+1, the hub/celebrity shape) changes NOTHING — hubs are
    dropped, never exploded, so a skewed key cannot re-enter as a
    deg^2 pair blow-up."""
    from etlp_spark.functions.graph import cooccurrence_edges

    pres = sorted(set(pres_pairs))
    # driver-side reference
    by_bucket: dict[int, set[int]] = {}
    for bkt, u in pres:
        by_bucket.setdefault(bkt, set()).add(u)
    from itertools import combinations

    counts: dict[tuple[int, int], int] = {}
    for members in by_bucket.values():
        if 2 <= len(members) <= cap:
            for a, b in combinations(sorted(members), 2):
                counts[(a, b)] = counts.get((a, b), 0) + 1
    ref = {p for p, c in counts.items() if c >= min_shared}

    if not pres:
        return
    df = spark.createDataFrame(pres, "bkt int, u int")
    got = {
        (r.a, r.b)
        for r in cooccurrence_edges(
            df, "u", ("bkt",), min_shared=min_shared, max_bucket=cap
        ).collect()
    }
    assert got == ref

    # hub invariance: one giant bucket (size cap+1) joins the data
    giant = [(99, 1000 + i) for i in range(cap + 1)]
    df2 = spark.createDataFrame(pres + giant, "bkt int, u int")
    got2 = {
        (r.a, r.b)
        for r in cooccurrence_edges(
            df2, "u", ("bkt",), min_shared=min_shared, max_bucket=cap
        ).collect()
    }
    assert got2 == ref


@settings(max_examples=200, deadline=None)
@given(
    xs=st.lists(st.integers(min_value=0, max_value=10**9), min_size=0, max_size=60),
    mu=st.integers(min_value=0, max_value=10**15),
    slack=st.integers(min_value=0, max_value=10**14),
)
def test_cusum_prefix_identity_equals_textbook_recursion(xs, mu, slack):
    """The closed form BOTH x120 and streaming.cusum_tws rest on:
    S_t = P_t - min(0, min_{j<=t} P_j) with P = cumsum(x*1e6 - mu -
    slack) equals Page's textbook recursion S_t = max(0, S_{t-1} +
    dev_t) at EVERY step — pure integers, so the equality is exact.
    (Proof sketch: both are the max suffix-sum ending at t, but the
    recursion is not a SQL window function and the closed form is.)"""
    p, minp, s_rec = 0, 0, 0
    for x in xs:
        dev = x * 1_000_000 - mu - slack
        p += dev
        minp = min(minp, p)
        s_closed = p - min(0, minp)
        s_rec = max(0, s_rec + dev)
        assert s_closed == s_rec


# ---------------------------------------------------------------------------
# round 10: persisted-index round-trip and GIF animation composition
# ---------------------------------------------------------------------------

_finite = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e12, max_value=1e12,
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    k=st.integers(min_value=1, max_value=6),
    dims=st.integers(min_value=1, max_value=8),
    data=st.data(),
)
def test_ivf_centroid_roundtrip_is_identity(spark, tmp_path_factory, k, dims, data):
    """Property: save→load of ANY centroid table is the identity —
    parquet FLOAT8 round-trips every finite double bit-for-bit, and
    the (cell) ordering is reconstructed from the stored column, not
    file order."""
    from etlp_spark.functions.ann_index import (
        load_ivf_centroids,
        save_ivf_centroids,
    )

    cents = data.draw(
        st.lists(
            st.lists(_finite, min_size=dims, max_size=dims),
            min_size=k, max_size=k,
        )
    )
    root = str(tmp_path_factory.mktemp("ivfprop"))
    save_ivf_centroids(spark, root, cents)
    assert load_ivf_centroids(spark, root) == [
        [float(x) for x in c] for c in cents
    ]


def _naive_gif_compose(sw, sh, bg_rgb, palette, frames_spec):
    """Reference compositor: the GIF89a disposal/transparency rules
    written independently of decode_gif_frames (dict-of-pixels, no
    numpy slicing) — what the production decoder must agree with."""
    import numpy as _np

    canvas = [[tuple(bg_rgb) for _ in range(sw)] for _ in range(sh)]
    out = []
    for (lx, ty, idx_rows, disposal, tflag, tidx) in frames_spec:
        before = [row[:] for row in canvas]
        for r, row in enumerate(idx_rows):
            for c, ix in enumerate(row):
                if tflag and ix == tidx:
                    continue
                canvas[ty + r][lx + c] = tuple(palette[ix])
        out.append(_np.array(canvas, dtype=_np.uint8))
        if disposal == 2:
            for r in range(len(idx_rows)):
                for c in range(len(idx_rows[0])):
                    canvas[ty + r][lx + c] = tuple(bg_rgb)
        elif disposal == 3:
            canvas = before
    return out


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_gif_animation_composition_matches_reference(data):
    """Property: decode_gif_frames(assembled animation) equals an
    independent naive compositor for random frame rects, disposal
    methods, and transparency flags — exercising LZW round-trip,
    sub-block splitting, and the canvas state machine together."""
    import struct as _st2

    import numpy as _np

    from etlp_spark.functions import multimodal as mm

    sw = data.draw(st.integers(2, 6))
    sh = data.draw(st.integers(2, 6))
    ncol = 4
    palette = _np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], _np.uint8
    )
    out = bytearray()
    out += b"GIF89a"
    out += _st2.pack("<HHBBB", sw, sh, 0x80 | (2 - 1), 0, 0)
    out += palette.tobytes()
    frames_spec = []
    n_frames = data.draw(st.integers(1, 4))
    for _ in range(n_frames):
        w = data.draw(st.integers(1, sw))
        h = data.draw(st.integers(1, sh))
        lx = data.draw(st.integers(0, sw - w))
        ty = data.draw(st.integers(0, sh - h))
        idx_rows = data.draw(
            st.lists(
                st.lists(st.integers(0, ncol - 1), min_size=w, max_size=w),
                min_size=h, max_size=h,
            )
        )
        disposal = data.draw(st.sampled_from([0, 1, 2, 3]))
        tflag = data.draw(st.booleans())
        tidx = data.draw(st.integers(0, ncol - 1))
        frames_spec.append((lx, ty, idx_rows, disposal, tflag, tidx))
        out += _st2.pack("<BBBBHBB", 0x21, 0xF9, 4,
                         (disposal << 2) | int(tflag), 0, tidx, 0)
        out += _st2.pack("<BHHHHB", 0x2C, lx, ty, w, h, 0)
        out.append(2)
        lzw = mm._gif_lzw_encode([i for row in idx_rows for i in row], 2)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += bytes(chunk)
        out.append(0)
    out += b"\x3b"

    got = mm.decode_gif_frames(bytes(out))
    want = _naive_gif_compose(sw, sh, palette[0], palette, frames_spec)
    assert len(got) == len(want)
    for g, w_ in zip(got, want):
        assert _np.array_equal(g, w_)
