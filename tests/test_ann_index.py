"""Persisted ANN index lifecycle (functions/ann_index.py): train →
persist → reload → search parity, versioned time travel, and the
contiguity validation that keeps a corrupted table loud."""

import pytest

from etlp_spark.connectors.snapshots import ConcurrentWriteError
from etlp_spark.functions.ann_index import (
    load_ivf_centroids,
    load_pq_codebooks,
    save_ivf_centroids,
    save_pq_codebooks,
)
from etlp_spark.functions.similarity import ivf_search, ivf_train, pq_codes
from etlp_spark.io import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def test_ivf_persist_roundtrip_bit_exact(spark, emb, tmp_path):
    trained = ivf_train(emb, k=4, iters=1)
    root = str(tmp_path / "ivf")
    v = save_ivf_centroids(spark, root, trained)
    assert v == 1  # SnapshotStore versions start at 1
    loaded = load_ivf_centroids(spark, root)
    # parquet FLOAT8 is an exact IEEE round-trip — equality, no atol
    assert loaded == trained


def test_ivf_persisted_search_parity(spark, emb, tmp_path):
    """The verdict-item contract: search through the RELOADED index
    returns exactly the in-run index's results (recall parity is
    equality here, since the centroids round-trip bit-for-bit)."""
    trained = ivf_train(emb, k=4, iters=2)
    root = str(tmp_path / "ivf")
    save_ivf_centroids(spark, root, trained)
    loaded = load_ivf_centroids(spark, root)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    got = ivf_search(emb, loaded, q, k=5, n_probe=2).collect()
    want = ivf_search(emb, trained, q, k=5, n_probe=2).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) == 5


def test_ivf_retrain_is_new_version_and_v0_time_travels(spark, emb, tmp_path):
    root = str(tmp_path / "ivf")
    first = ivf_train(emb, k=4, iters=1)
    second = ivf_train(emb, k=4, iters=2)
    assert first != second
    assert save_ivf_centroids(spark, root, first) == 1
    assert save_ivf_centroids(spark, root, second) == 2
    assert load_ivf_centroids(spark, root) == second  # latest wins
    assert load_ivf_centroids(spark, root, version=1) == first  # pinned


def test_ivf_train_publish_goes_through_commit_protocol(spark, emb, tmp_path):
    """Index saves thread the pluggable commit protocol — a losing
    conditional PUT (another trainer won the version) surfaces as a
    loud ConcurrentWriteError, exactly as for data tables (the race
    semantics themselves are covered in test_snapshots.py)."""
    from etlp_spark.connectors.snapshots import ConditionalPutCommitProtocol

    root = str(tmp_path / "ivf")
    c = ivf_train(emb, k=4, iters=1)
    always_lose = ConditionalPutCommitProtocol(lambda key, payload: False)
    with pytest.raises(ConcurrentWriteError):
        save_ivf_centroids(spark, root, c, commit_protocol=always_lose)


def test_centroid_table_contiguity_validated(spark, tmp_path):
    root = str(tmp_path / "ivf")
    save_ivf_centroids(spark, root, [[0.0, 1.0], [2.0, 3.0]])
    # corrupt: drop cell 0 by persisting a gapped table directly
    from etlp_spark.connectors.snapshots import SnapshotStore
    from pyspark.sql import Row

    bad = spark.createDataFrame(
        [Row(cell=1, centroid=[0.0, 1.0]), Row(cell=3, centroid=[2.0, 3.0])],
        schema="cell INT NOT NULL, centroid ARRAY<DOUBLE> NOT NULL",
    )
    SnapshotStore(root).write(bad, mode="snapshot")
    with pytest.raises(ValueError, match="contiguous"):
        load_ivf_centroids(spark, root)
    assert load_ivf_centroids(spark, root, version=1) == [
        [0.0, 1.0],
        [2.0, 3.0],
    ]


def test_save_rejects_ragged_centroids(spark, tmp_path):
    with pytest.raises(ValueError, match="dimensionality"):
        save_ivf_centroids(spark, str(tmp_path / "x"), [[1.0], [1.0, 2.0]])
    with pytest.raises(ValueError, match="empty"):
        save_ivf_centroids(spark, str(tmp_path / "y"), [])


def test_pq_codebook_roundtrip_and_encode_parity(spark, emb, tmp_path):
    from etlp_spark.queries import _pq_fixed_codebooks

    books = _pq_fixed_codebooks()
    root = str(tmp_path / "pq")
    assert save_pq_codebooks(spark, root, books) == 1
    loaded = load_pq_codebooks(spark, root)
    assert loaded == books
    got = pq_codes(emb, loaded).orderBy("vec_id").limit(20).collect()
    want = pq_codes(emb, books).orderBy("vec_id").limit(20).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pq_codebooks_mixed_subdims_roundtrip(spark, tmp_path):
    """Books of different subdims (matryoshka splits) must survive."""
    books = [
        [[0.5, -0.5], [1.0, 2.0]],
        [[1.0, 2.0, 3.0], [0.0, 0.0, 1.0], [4.0, 5.0, 6.0]],
    ]
    root = str(tmp_path / "pq")
    save_pq_codebooks(spark, root, books)
    assert load_pq_codebooks(spark, root) == books


def test_pq_save_rejects_ragged_book(spark, tmp_path):
    with pytest.raises(ValueError, match="mixed dims"):
        save_pq_codebooks(
            spark, str(tmp_path / "x"), [[[1.0, 2.0], [1.0]]]
        )


def test_ensure_ivf_index_trains_at_most_once(spark, emb, tmp_path):
    """ensure_ivf_index: first call trains + publishes + returns the
    STORED form; every later call loads without training (the
    train-once lifecycle x137 demonstrates)."""
    from etlp_spark.functions.ann_index import ensure_ivf_index

    calls = {"n": 0}

    def train():
        calls["n"] += 1
        return ivf_train(emb, k=4, iters=1)

    root = str(tmp_path / "ivf")
    first = ensure_ivf_index(spark, root, train)
    second = ensure_ivf_index(spark, root, train)
    assert calls["n"] == 1
    assert first == second == ivf_train(emb, k=4, iters=1)


def test_x141_stale_side_loads_published_index(spark, sf_dir, monkeypatch):
    """The staleness audit's STALE side consumes the published
    SnapshotStore artifact: once the index exists, a run trains
    exactly ONCE (the fresh side — the audit's subject), never the
    stale side (VERDICT r10 item 2). Counted by wrapping ivf_train at
    the module the query imports from at call time."""
    import etlp_spark.functions.similarity as sim
    from etlp_spark.connectors.snapshots import SnapshotStore
    from etlp_spark.queries import QUERIES, _index_root

    real_train = sim.ivf_train
    calls = {"n": 0}

    def counting_train(*a, **kw):
        calls["n"] += 1
        return real_train(*a, **kw)

    monkeypatch.setattr(sim, "ivf_train", counting_train)

    first = QUERIES["x141_ivf_index_staleness"].fn(spark, sf_dir).collect()
    first_trainings = calls["n"]
    # first run: fresh side (1) + stale side only if the store was
    # empty (0 on a warm tempdir, 1 on a cold one)
    assert first_trainings in (1, 2)

    calls["n"] = 0
    second = QUERIES["x141_ivf_index_staleness"].fn(spark, sf_dir).collect()
    # the published artifact exists now: ONLY the fresh side trains
    assert calls["n"] == 1
    assert [tuple(r) for r in second] == [tuple(r) for r in first]

    root = _index_root(sf_dir, "embeddings", "ivf-k8-i2-mod20|v1")
    assert SnapshotStore(root).latest_version() >= 1


def _race_worker(root: str, tag: float, go, q) -> None:
    """Subprocess body for the two-process ensure_ivf_index race
    (module-level for spawn pickling): build an ISOLATED SparkSession
    (own JVM — local[2], UI off, random driver port), line up on the
    shared barrier event so both processes hit the empty store
    together, then race ensure. Reports (trained?, centroids)."""
    import os

    os.environ["SPARK_GRAFT_CPUS"] = "2"
    os.environ["SPARK_GRAFT_MASTER"] = "local[2]"
    try:
        from etlp_spark.functions.ann_index import ensure_ivf_index
        from etlp_spark.session import get_spark

        spark = get_spark(
            app_name=f"race-{tag}",
            extra_conf={
                "spark.ui.enabled": "false",
                "spark.driver.memory": "1g",
            },
        )
        trained = {"n": 0}

        def train():
            trained["n"] += 1
            return [[tag, tag], [tag + 0.5, tag + 0.5]]

        go.wait(timeout=120)
        got = ensure_ivf_index(spark, root, train)
        q.put(("ok", trained["n"], got))
        spark.stop()
    except Exception as e:  # noqa: BLE001 — report, don't hang join
        q.put(("err", 0, repr(e)))


def test_ensure_ivf_index_two_process_race(tmp_path):
    """VERDICT r11 item 4: the one-training-only claim under a REAL
    two-process race — two separate Spark sessions (separate JVMs,
    separate Python processes) call ensure_ivf_index on the SAME
    empty root simultaneously. The versioned commit protocol
    (LinkCommitProtocol: link(2) is atomic-exclusive) guarantees
    exactly ONE v1 manifest exists afterward, and BOTH processes
    return the WINNER's centroids — the loser's ConcurrentWriteError
    is swallowed by _ensure's load-the-winner path, never surfaced
    as a user failure and never a silent clobber."""
    import multiprocessing as mp

    from etlp_spark.connectors.snapshots import SnapshotStore

    ctx = mp.get_context("spawn")
    root = str(tmp_path / "ivf_race")
    go = ctx.Event()
    q = ctx.Queue()
    p1 = ctx.Process(target=_race_worker, args=(root, 1.0, go, q))
    p2 = ctx.Process(target=_race_worker, args=(root, 2.0, go, q))
    p1.start()
    p2.start()
    go.set()  # both sessions are building; release the race
    results = [q.get(timeout=300), q.get(timeout=300)]
    p1.join(timeout=60)
    p2.join(timeout=60)
    for status, _n, payload in results:
        assert status == "ok", payload

    # exactly one publish won: a single v1 manifest, no v2
    assert SnapshotStore(root).versions() == [1]
    # both processes ended on the SAME index — the winner's
    a, b = results[0][2], results[1][2]
    assert a == b
    assert a in ([[1.0, 1.0], [1.5, 1.5]], [[2.0, 2.0], [2.5, 2.5]])
    # at least one trained; a double-training is allowed ONLY when
    # both raced past the empty-store check — the publish still
    # collapsed them onto one artifact
    assert sum(n for _s, n, _p in results) >= 1


def test_crash_between_write_and_commit(spark, tmp_path):
    """VERDICT r11 item 4's documented crash case: a writer that
    stages its parquet data but DIES before the manifest publish
    leaves the store at the previous version (here: empty) — the
    orphaned data files are invisible to readers (manifest-based
    reads list exact files, never the directory), latest_version()
    stays None, and the next ensure_ivf_index call trains and
    publishes normally. Crash-consistency comes from ordering
    (data first, manifest last), not from cleanup."""
    from etlp_spark.connectors.snapshots import (
        LinkCommitProtocol,
        SnapshotStore,
    )
    from etlp_spark.functions.ann_index import ensure_ivf_index

    class CrashBeforeCommit(LinkCommitProtocol):
        def publish(self, payload: bytes, dest: str) -> None:
            raise RuntimeError("simulated writer death before commit")

    root = str(tmp_path / "ivf_crash")
    with pytest.raises(RuntimeError, match="simulated writer death"):
        save_ivf_centroids(
            spark, root, [[9.0, 9.0]], commit_protocol=CrashBeforeCommit()
        )
    store = SnapshotStore(root)
    assert store.latest_version() is None  # nothing published
    import glob
    import os

    orphans = glob.glob(os.path.join(root, "**", "*.parquet"),
                        recursive=True)
    assert orphans, "crash case must leave staged data to ignore"

    trained = {"n": 0}

    def train():
        trained["n"] += 1
        return [[1.0, 2.0], [3.0, 4.0]]

    got = ensure_ivf_index(spark, root, train)
    assert trained["n"] == 1 and got == [[1.0, 2.0], [3.0, 4.0]]
    assert store.latest_version() == 1
    # the recovered store reads ONLY the committed manifest's files —
    # the crashed writer's orphans (9.0 markers) never surface
    assert load_ivf_centroids(spark, root) == [[1.0, 2.0], [3.0, 4.0]]


def test_index_root_rotates_when_dataset_changes(tmp_path):
    """_index_root keys by dataset CONTENT (file sizes + mtimes), so
    regenerating the data at the same path yields a DIFFERENT index
    root instead of silently serving the stale artifact (the r10
    advice finding on x137)."""
    import os

    from etlp_spark.queries import _index_root

    ds = tmp_path / "sfX"
    ds.mkdir()
    f = ds / "embeddings.parquet"
    f.write_bytes(b"PAR1-fake-bytes")
    r1 = _index_root(str(ds), "embeddings", "ivf|v1")
    assert r1 == _index_root(str(ds), "embeddings", "ivf|v1")  # stable

    f.write_bytes(b"PAR1-fake-bytes-regenerated")  # size change
    r2 = _index_root(str(ds), "embeddings", "ivf|v1")
    assert r2 != r1

    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    r3 = _index_root(str(ds), "embeddings", "ivf|v1")  # mtime-only change
    assert r3 != r2

    # directory-shaped table (multi-split parquet): every file counts
    d = ds / "documents.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a")
    da = _index_root(str(ds), "documents", "ivf|v1")
    (d / "part-1.parquet").write_bytes(b"b")
    assert _index_root(str(ds), "documents", "ivf|v1") != da
    assert _index_root(str(ds), "documents", "ivf|v1") != r1  # table-keyed


def test_ensure_pq_codebooks_prefers_published_version(spark, tmp_path):
    """A root that already holds a (different) published codebook
    wins over the trainer — version pinning is the feature: the
    caller's root key says what the index was built from."""
    from etlp_spark.functions.ann_index import ensure_pq_codebooks

    root = str(tmp_path / "pq")
    published = [[[1.0, 2.0], [3.0, 4.0]]]
    save_pq_codebooks(spark, root, published)
    got = ensure_pq_codebooks(
        spark, root, lambda: [[[9.0, 9.0], [8.0, 8.0]]]
    )
    assert got == published


def test_ensure_ivf_index_records_occupancy_diagnostics(spark, tmp_path):
    """The r13 MoG study's k-guidance, moved from prose into the
    artifact (r13 verdict item 7): training through ensure_ivf_index
    with a corpus records ivf_k / ivf_n_vectors / ivf_top_cell_share
    / ivf_top_share_factor in the published manifest's properties,
    warns (UserWarning naming the k~sqrt(N) remedy) when the fattest
    cell exceeds IVF_TOP_SHARE_FACTOR x fair share, and a balanced
    corpus records diagnostics WITHOUT warning. Centroids come from a
    HAND-PICKED trainer so the assignment split is exact and the test
    pins the diagnostic, not the trainer's init: a MoG-shaped corpus
    (one 97-point blob + three far singletons) against one centroid
    per mode puts 97% in one cell (3.88x fair share at k=4). The load
    path and corpus-less calls are unchanged (no properties, no extra
    scan)."""
    import warnings

    from etlp_spark.connectors.snapshots import SnapshotStore
    from etlp_spark.functions.ann_index import ensure_ivf_index

    modes = [[0.0, 0.0], [1000.0, 0.0], [0.0, 1000.0], [1000.0, 1000.0]]
    rows = [(i, [(i % 3) * 0.01, (i % 5) * 0.01]) for i in range(97)]
    rows += [(97 + j, modes[1 + j]) for j in range(3)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )

    def train():
        return [list(m) for m in modes]

    root = str(tmp_path / "ivf_skewed")
    with warnings.catch_warnings(record=True) as got:
        warnings.simplefilter("always")
        ensure_ivf_index(spark, root, train, corpus=corpus)
    skew_warnings = [w for w in got if "fattest cell" in str(w.message)]
    assert len(skew_warnings) == 1
    assert "k ~ sqrt(N)" in str(skew_warnings[0].message)

    props = SnapshotStore(root).manifest(1)["properties"]
    assert props["ivf_k"] == 4 and props["ivf_n_vectors"] == 100
    assert props["ivf_top_cell_share"] == 0.97  # the blob cell, exact
    assert props["ivf_top_share_factor"] == 3.88

    # the LOAD path never re-scans or re-warns, even with a corpus
    with warnings.catch_warnings(record=True) as got2:
        warnings.simplefilter("always")
        again = ensure_ivf_index(spark, root, train, corpus=corpus)
    assert not [w for w in got2 if "fattest cell" in str(w.message)]
    assert again == ensure_ivf_index(spark, root, train)

    # corpus-less training records NO properties (gated queries'
    # existing byte-identical path)
    root2 = str(tmp_path / "ivf_plain")
    ensure_ivf_index(spark, root2, train)
    assert "properties" not in SnapshotStore(root2).manifest(1)

    # a perfectly balanced corpus: diagnostics recorded, no warning
    brows = [
        (i, [float(i % 2) * 1000, float((i // 2) % 2) * 1000])
        for i in range(64)
    ]
    balanced = spark.createDataFrame(
        brows, "vec_id long, embedding array<double>"
    )
    root3 = str(tmp_path / "ivf_balanced")
    with warnings.catch_warnings(record=True) as got3:
        warnings.simplefilter("always")
        ensure_ivf_index(spark, root3, train, corpus=balanced)
    assert not [w for w in got3 if "fattest cell" in str(w.message)]
    bp = SnapshotStore(root3).manifest(1)["properties"]
    assert bp["ivf_top_cell_share"] == 0.25
    assert bp["ivf_top_share_factor"] == 1.0
