"""Versioned-manifest commit protocol (r11) — unit tests plus crash
injection over every persistent-state owner.

The protocol (``streamtasks_spark/core/state.py``) replaces the r10
directory-rename swaps: data lands in immutable segment directories,
and the ONLY commit point is one atomic single-file replacement of
``_MANIFEST.json`` (``_flip``). These tests inject a crash exactly at
that point — the one instant the old protocol could not survive on an
object store — and assert, for the core API and for every index class
and sketch-state twin, that a reader still resolves version N−1
intact, that the crash debris is invisible and swept, and that a clean
retry converges to the one-shot result bit-exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.core import state
from streamtasks_spark.llmdata.dedup import snapshot_read
from streamtasks_spark.session import read_parquet

SF_DIR = "/root/testdata/sf0.001"


class _FlipCrash(RuntimeError):
    pass


class _crash_at_flip:
    """Context manager: the Nth _flip call raises (counting from 1),
    simulating a kill between the data write and the pointer flip."""

    def __init__(self, monkeypatch, at: int = 1):
        self.monkeypatch = monkeypatch
        self.at = at
        self.calls = 0

    def __enter__(self):
        orig = state._flip

        def flip(tmp, dst):
            self.calls += 1
            if self.calls == self.at:
                raise _FlipCrash(f"injected crash at flip #{self.at}")
            orig(tmp, dst)

        self.monkeypatch.setattr(state, "_flip", flip)
        return self

    def __exit__(self, *exc):
        self.monkeypatch.undo()
        return False


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


# ------------------------------------------------------------- core API


def test_replace_and_append_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t")
    state.replace_write(
        spark.createDataFrame([(1, "a")], "id int, v string"), p, coalesce=1
    )
    m1 = state.read_manifest(p)
    assert m1["version"] == 1 and len(m1["segments"]) == 1
    state.append_write(
        spark.createDataFrame([(2, "b")], "id int, v string"), p
    )
    assert _canon(snapshot_read(spark, p)) == [(1, "a"), (2, "b")]
    # replace supersedes: one live segment, old ones swept
    state.replace_write(
        spark.createDataFrame([(3, "c")], "id int, v string"), p
    )
    m3 = state.read_manifest(p)
    assert m3["version"] == 3 and len(m3["segments"]) == 1
    segs = [e for e in os.listdir(p) if e.startswith("seg_")]
    assert sorted(segs) == sorted(m3["segments"])
    assert _canon(snapshot_read(spark, p)) == [(3, "c")]


def test_partitioned_segments_keep_column_and_prune(spark, tmp_path):
    p = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(i, i % 4) for i in range(64)], "id int, __cell int"
    )
    state.append_write(df, p, partition_by="__cell")
    state.append_write(df, p, partition_by="__cell")
    r = snapshot_read(spark, p)
    assert "__cell" in r.columns
    assert r.count() == 128
    plan = (
        r.filter(F.col("__cell") == 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the partition filter must reach EVERY segment scan
    assert plan.count("PartitionFilters: [isnotnull(__cell") == 2, plan[:2000]


def test_crash_at_flip_preserves_previous_version(spark, tmp_path, monkeypatch):
    p = str(tmp_path / "t")
    v1 = spark.createDataFrame([(1, "a")], "id int, v string")
    state.replace_write(v1, p, coalesce=1)
    before = _canon(snapshot_read(spark, p))
    with _crash_at_flip(monkeypatch):
        with pytest.raises(_FlipCrash):
            state.replace_write(
                spark.createDataFrame([(9, "z")], "id int, v string"), p
            )
    # reader still sees v1 intact; the debris is an invisible orphan
    assert state.read_manifest(p)["version"] == 1
    assert _canon(snapshot_read(spark, p)) == before
    orphans = [e for e in os.listdir(p) if e.startswith("seg_")]
    assert len(orphans) == 2  # live + orphan
    # next successful commit sweeps the orphan
    state.append_write(
        spark.createDataFrame([(2, "b")], "id int, v string"), p
    )
    live = set(state.read_manifest(p)["segments"])
    assert {e for e in os.listdir(p) if e.startswith("seg_")} == live
    assert _canon(snapshot_read(spark, p)) == [(1, "a"), (2, "b")]


def test_uncommitted_segment_is_invisible(spark, tmp_path):
    p = str(tmp_path / "t")
    state.replace_write(
        spark.createDataFrame([(1, "a")], "id int, v string"), p
    )
    # simulate a crash during the data write itself: a reserved but
    # never-committed segment directory with real parquet in it
    _, seg = state.new_segment(p)
    spark.createDataFrame([(9, "z")], "id int, v string").write.parquet(seg)
    assert _canon(snapshot_read(spark, p)) == [(1, "a")]


def test_legacy_directory_adoption(spark, tmp_path):
    # a pre-manifest table written by the old protocol keeps its
    # history across the first manifest append, and is replaced
    # wholesale by a manifest replace
    p = str(tmp_path / "legacy")
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(p)
    state.append_write(
        spark.createDataFrame([(2, "b")], "id int, v string"), p
    )
    assert _canon(snapshot_read(spark, p)) == [(1, "a"), (2, "b")]
    p2 = str(tmp_path / "legacy2")
    spark.createDataFrame([(1, "a")], "id int, v string").write.parquet(p2)
    state.replace_write(
        spark.createDataFrame([(3, "c")], "id int, v string"), p2
    )
    assert _canon(snapshot_read(spark, p2)) == [(3, "c")]
    # and the loose legacy files were folded + swept, not left to
    # shadow plain directory listings
    assert not [e for e in os.listdir(p2) if e.endswith(".parquet")]


# -------------------------------------------- index/sketch state owners
#
# Each case: build state from batch 1, snapshot the durable state,
# inject a crash at flip #`at` while ingesting batch 2, assert the
# reader still sees batch 1's state intact, then retry batch 2 cleanly
# and assert the final state/answers equal the one-shot build.


def _docs(spark):
    return read_parquet(spark, f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _vecs(spark):
    return read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def test_bloom_index_crash_at_flip(spark, tmp_path, monkeypatch):
    from streamtasks_spark.llmdata.dedup import BloomIndex, _bloom_bits

    docs = _docs(spark)
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    idx = BloomIndex(str(tmp_path / "bloom"), m_bits=1 << 16)
    idx.ingest(b1)
    before = sorted(
        r["__pos"] for r in snapshot_read(spark, idx.bits_path).collect()
    )
    with _crash_at_flip(monkeypatch):
        with pytest.raises(_FlipCrash):
            idx.ingest(b2)
    after_crash = sorted(
        r["__pos"] for r in snapshot_read(spark, idx.bits_path).collect()
    )
    assert after_crash == before
    idx.ingest(b2)  # clean retry
    want = sorted(
        r["__pos"]
        for r in _bloom_bits(docs, "doc_id", "text", 1 << 16, 5).collect()
    )
    got = sorted(
        set(
            r["__pos"]
            for r in snapshot_read(spark, idx.bits_path).collect()
        )
    )
    assert got == want


def test_paragraph_index_crash_at_flip(spark, tmp_path, monkeypatch):
    """ParagraphIndex has ONE commit (seen/): a crash at the flip
    leaves history untouched, the retry re-reports the batch's
    survivors identically, and the id-ordered ingest sequence still
    converges to the one-shot paragraph_dedup output."""
    from streamtasks_spark.llmdata.dedup import ParagraphIndex, paragraph_dedup

    docs = _docs(spark).select(
        "doc_id",
        F.concat(F.col("text"), F.lit("\n\nshared footer")).alias("text"),
    )
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)
    idx = ParagraphIndex(str(tmp_path / "para"))
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_kept"])
        for r in idx.ingest(b1).collect()
    }
    before = snapshot_read(spark, idx.seen_path).count()
    with _crash_at_flip(monkeypatch):
        with pytest.raises(_FlipCrash):
            idx.ingest(b2)
    assert snapshot_read(spark, idx.seen_path).count() == before
    for r in idx.ingest(b2).collect():  # clean retry
        assert r["doc_id"] not in got
        got[r["doc_id"]] = (r["n_paras"], r["n_kept"], r["text_kept"])
    want = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_kept"])
        for r in paragraph_dedup(docs).collect()
    }
    assert got == want
    # compact durably folds any replay-duplicated hash rows
    idx.compact(spark, files=2)
    h = snapshot_read(spark, idx.seen_path)
    assert h.count() == h.distinct().count()


@pytest.mark.parametrize("at", [1, 2])
def test_minhash_index_crash_at_flip(spark, tmp_path, monkeypatch, at):
    """flip #1 = hashes (nothing committed), flip #2 = bands (hashes
    committed, postings not) — either way the verify invariant holds:
    no posting can ever reference a missing hash row, and the retry
    converges to the one-shot pair set."""
    from streamtasks_spark.llmdata.dedup import MinHashIndex, dedup_minhash

    docs = _docs(spark)
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    idx = MinHashIndex(str(tmp_path / "mh"), threshold=0.5)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in idx.ingest(b1).collect()
    }
    bands_before = snapshot_read(spark, idx.bands_path).count()
    with _crash_at_flip(monkeypatch, at=at):
        with pytest.raises(_FlipCrash):
            idx.ingest(b2)
    # postings unchanged either way (bands commit is the LAST flip)
    assert snapshot_read(spark, idx.bands_path).count() == bands_before
    hashes = snapshot_read(spark, idx.hashes_path)
    posts = snapshot_read(spark, idx.bands_path)
    # verify-join invariant: every posting has its hash row
    assert (
        posts.join(hashes, "doc_id", "left_anti").count() == 0
    )
    for r in idx.ingest(b2).collect():  # clean retry
        pairs[(r["doc_a"], r["doc_b"])] = r["jaccard"]
    want = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash(docs, threshold=0.5).collect()
    }
    assert pairs == want
    # compact durably folds any replay-duplicated hash rows
    idx.compact(spark, files_per_table=2)
    h = snapshot_read(spark, idx.hashes_path)
    assert h.count() == h.select("doc_id").distinct().count()


def test_ivf_index_crash_at_flip(spark, tmp_path, monkeypatch):
    from streamtasks_spark.llmdata.similarity import IvfIndex

    vecs = _vecs(spark)
    b1 = vecs.filter(F.col("vec_id") < 250)
    b2 = vecs.filter(F.col("vec_id") >= 250)
    qs = vecs.filter(F.col("vec_id") < 5)
    idx = IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    idx.ingest(b1)
    before = _canon(idx.query(qs, k=3))
    # flips during second ingest: #1 is the cells append (centroids
    # are already frozen)
    with _crash_at_flip(monkeypatch):
        with pytest.raises(_FlipCrash):
            idx.ingest(b2)
    assert _canon(idx.query(qs, k=3)) == before  # answers from v1 only
    idx.ingest(b2)
    one = IvfIndex(str(tmp_path / "ivf_one"), n_cells=8, n_probe=2)
    one.ingest(b1)
    one.ingest(b2)
    assert _canon(idx.query(qs, k=3)) == _canon(one.query(qs, k=3))


@pytest.mark.slow  # slow tier (pytest.ini, r12)
@pytest.mark.parametrize("at", [1, 2])
def test_ivf_pq_index_crash_at_flip(spark, tmp_path, monkeypatch, at):
    """Second-ingest flips: #1 = vectors (raw side), #2 = cells
    (codes). A crash between them leaves orphan RAW rows only — the
    direction query() tolerates by construction (candidates originate
    from cells); the r10 advisor's silent-candidate-drop window is
    closed. The retry converges to the one-shot twin."""
    from streamtasks_spark.llmdata.similarity import IvfPqIndex

    vecs = _vecs(spark)
    b1 = vecs.filter(F.col("vec_id") < 250)
    b2 = vecs.filter(F.col("vec_id") >= 250)
    qs = vecs.filter(F.col("vec_id") < 5)
    kw = dict(n_cells=8, n_probe=2, m_sub=8, n_codes=8, rerank=4)
    idx = IvfPqIndex(str(tmp_path / "ivfpq"), **kw)
    idx.ingest(b1)
    before = _canon(idx.query(qs, k=3))
    with _crash_at_flip(monkeypatch, at=at):
        with pytest.raises(_FlipCrash):
            idx.ingest(b2)
    # codes table unchanged either way (cells commit is the LAST
    # flip), so answers still come from v1 — and never miss an ADC
    # candidate for lack of a raw row
    assert _canon(idx.query(qs, k=3)) == before
    idx.ingest(b2)
    one = IvfPqIndex(str(tmp_path / "ivfpq_one"), **kw)
    one.ingest(b1)
    one.ingest(b2)
    assert _canon(idx.query(qs, k=3)) == _canon(one.query(qs, k=3))


def test_semdedup_index_crash_at_flip(spark, tmp_path, monkeypatch):
    from streamtasks_spark.llmdata.similarity import SemDedupIndex

    vecs = _vecs(spark)
    b1 = vecs.filter(F.col("vec_id") < 250)
    b2 = vecs.filter(F.col("vec_id") >= 250)
    idx = SemDedupIndex(str(tmp_path / "sem"), threshold=0.35)
    v1 = _canon(idx.ingest(b1))
    kept_before = snapshot_read(spark, idx.kept_path).count()
    with _crash_at_flip(monkeypatch):
        with pytest.raises(_FlipCrash):
            idx.ingest(b2)
    assert snapshot_read(spark, idx.kept_path).count() == kept_before
    v2 = _canon(idx.ingest(b2))  # clean retry
    one = SemDedupIndex(str(tmp_path / "sem_one"), threshold=0.35)
    assert _canon(one.ingest(b1)) == v1
    assert _canon(one.ingest(b2)) == v2


def test_atomic_state_write_crash_at_flip(spark, tmp_path, monkeypatch):
    """The sketch-state rewrite used by the streaming HLL/CMS twins:
    a crash at the flip leaves the previous registers the live ones —
    never empty state, never a half rewrite."""
    from streamtasks_spark.streaming.stateful import _atomic_state_write

    p = str(tmp_path / "sketch")
    _atomic_state_write(
        spark, [(0, 5), (1, 7)], "__bucket int, __M int", p
    )
    before = _canon(snapshot_read(spark, p))
    with _crash_at_flip(monkeypatch):
        with pytest.raises(_FlipCrash):
            _atomic_state_write(
                spark, [(0, 6), (1, 9)], "__bucket int, __M int", p
            )
    assert _canon(snapshot_read(spark, p)) == before
    _atomic_state_write(
        spark, [(0, 6), (1, 9)], "__bucket int, __M int", p
    )
    # _canon sorts columns by name: (__M, __bucket)
    assert _canon(snapshot_read(spark, p)) == [(6, 0), (9, 1)]
