"""Systematic batch ≡ streaming equivalence sweep over the driver's
events table.

One parametrized test drives every event-time streaming twin and its
batch counterpart over the SAME sf0.001 events rows, chunked into 8
time-ordered micro-batches (plus a far-future flush row that pushes the
final watermark past every real window), and asserts full-frame
equality — the reference's ordering test
(/root/reference/tests/comm/test_sync.py:37-73) generalized across the
whole twin surface. The per-twin tests in test_streaming.py pin each
operator's specific semantics (late data, fail modes, watermark
horizons); this sweep pins the SURFACE: every twin, one harness, one
dataset, frame-for-frame.

Both sides read the identical chunked copy of the data (the batch side
reads the chunk directory back), so the comparison is pure semantics —
no sampling or re-generation skew. Excluded by design: the two
wall-clock twins (streaming_message_detector, streaming_time_buffer
hold rows for PROCESSING time — no batch oracle exists; their
semantics + checkpoint recovery are pinned in test_streaming.py) and
streaming_dedup_minhash and streaming_semantic_dedup (foreachBatch
against persistent indexes; each has its own batch-equivalence +
restart tests in test_streaming.py).
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.core.timeutil import ensure_event_time
from streamtasks_spark.session import read_parquet

SF_DIR = "/root/testdata/sf0.001"
N_CHUNKS = 8
CHUNK_SIZE = 125  # sf0.001 events has contiguous event_id 0..999
FLUSH_TYPE = "__flush"


@pytest.fixture(scope="module")
def chunk_dir(spark, tmp_path_factory):
    """events sf0.001 split into 8 event-id-octile parquet files (ts is
    nondecreasing in event_id order, so chunks are time-ordered — the
    reference's per-topic nondecreasing contract, SURVEY §1.3), plus a
    final flush row 10 days past max(ts) so every watermarked window
    closes. File mtimes are forced strictly increasing (the parquet
    file stream orders by modification time) without sleeps."""
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    assert ev.count() == N_CHUNKS * CHUNK_SIZE  # ids 0..999 contiguous
    d = tmp_path_factory.mktemp("events_octiles")
    for i in range(N_CHUNKS):
        part = ev.filter(
            F.floor(F.col("event_id") / CHUNK_SIZE) == F.lit(i)
        )
        (
            part.coalesce(1)
            .sortWithinPartitions("event_id")
            .write.parquet(str(d / f"c{i:02d}"))
        )
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    flush = spark.createDataFrame(
        [(10**9, max_ts, -1, FLUSH_TYPE, 0.0, None)],
        ev.schema,
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    flush.coalesce(1).write.parquet(str(d / "c99_flush"))
    # strictly increasing mtimes in chunk order, no sleeps
    t0 = 1_700_000_000
    for i, sub in enumerate(sorted(os.listdir(d))):
        for f in os.listdir(d / sub):
            os.utime(d / sub / f, (t0 + 10 * i, t0 + 10 * i))
    return d


def batch_events(spark, chunk_dir):
    """The batch side reads the SAME chunked copy (flush row included
    unless the spec filters it) — zero data skew between the sides."""
    return ensure_event_time(spark.read.parquet(str(chunk_dir / "c*")))


def stream_events(spark, chunk_dir):
    schema = read_parquet(spark, f"{SF_DIR}/events.parquet").schema
    return ensure_event_time(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(chunk_dir))
    )


def run_stream(spark, df, tmp_path):
    name = f"eq_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


# ------------------------------------------------------------- helpers

def _typed(ev, t):
    return ev.filter(F.col("event_type") == t)


def _ctl01(df):
    return df.withColumn(
        "value", F.when(F.col("value") > 25, F.lit(1.0)).otherwise(F.lit(0.0))
    )


def _ctl_invalid(df):
    # NULL control values (every value > 40) exercise the fail modes
    return df.withColumn(
        "value",
        F.when(F.col("value") > 40, F.lit(None).cast("double")).otherwise(
            F.when(F.col("value") > 20, F.lit(1.0)).otherwise(F.lit(0.0))
        ),
    )


def _narrow(df):
    return df.select("user_id", "ts", "value", "event_id")


SAMPLES = "transform(sequence(0, 15), j -> cast(pmod(event_id + j, 9) as double))"
DEDUP_TEXT = (
    "concat(event_type, ' body ', cast(pmod(cast(value * 10 as bigint), 40)"
    " as string))"
)


# ---------------------------------------------------------------- specs
#
# each spec: name -> (build(ev_or_stream, module, spark, chunk_dir),
#                     row_key(row))
# `build` receives a factory it calls once per needed source (the
# interval join needs two independent stream instances).

def sp_last_value_join(src, m):
    fn = getattr(m, "streaming_last_value_join", None) or m.last_value_join
    return fn(
        _narrow(_typed(src(), "click")),
        {
            "p": _narrow(_typed(src(), "purchase")),
            "e": _narrow(_typed(src(), "error")),
        },
        keys=["user_id"],
        seq_col="event_id",
    )


def sp_gate(src, m):
    fn = getattr(m, "streaming_gate", None) or m.gate
    ev = src()
    return fn(
        _typed(ev, "click").unionByName(_typed(ev, "view")),
        _ctl01(_typed(src(), "purchase")),
        keys=["user_id"],
        seq_col="event_id",
    )


def sp_gate_fail_closed(src, m):
    fn = getattr(m, "streaming_gate", None) or m.gate
    ev = src()
    return fn(
        _typed(ev, "click").unionByName(_typed(ev, "view")),
        _ctl_invalid(_typed(src(), "purchase")),
        keys=["user_id"],
        seq_col="event_id",
        fail_mode="closed",
    )


def sp_pause_state(src, m):
    fn = getattr(m, "streaming_pause_state", None) or m.pause_state
    return fn(
        _typed(src(), "click"),
        _ctl01(_typed(src(), "error")),
        keys=["user_id"],
        seq_col="event_id",
    )


def sp_switch(src, m):
    fn = getattr(m, "streaming_switch", None) or m.switch
    ev = src()
    pairs = [
        (_typed(ev, "view"), _typed(ev, "click")),
        (_typed(ev, "error"), _typed(ev, "purchase")),
    ]
    return fn(pairs, keys=["user_id"], seq_col="event_id")


def sp_sr_latch(src, m):
    fn = getattr(m, "streaming_sr_latch", None) or m.sr_latch
    ev = src()
    return fn(
        _ctl01(_typed(ev, "purchase")),
        _ctl01(_typed(ev, "error")),
        keys=["user_id"],
        seq_col="event_id",
    )


def sp_ordered_merge(src, m):
    fn = getattr(m, "streaming_ordered_merge", None)
    # arrival permutes WITHIN each micro-batch chunk but keeps chunks
    # arrival-ordered: the batch operator sorts arrival globally while
    # the stream replays chunk-by-chunk, so a permutation spanning
    # chunk boundaries would make the two sides legitimately disagree
    # about which rows are late (the dedicated single-batch permuted
    # test in test_streaming.py covers the fully-shuffled geometry)
    arrival = (
        F.floor(F.col("event_id") / CHUNK_SIZE) * F.lit(4294967296)
        + (F.col("event_id") * F.lit(2654435761)) % F.lit(4294967296)
    )
    ev = src()
    streams = [
        _narrow(_typed(ev, t)).withColumn("arrival", arrival)
        for t in ("click", "view", "error")
    ]
    if fn is not None:
        return fn(streams, keys=["user_id"], seq_col="arrival")
    return m.ordered_merge(
        streams, keys=["user_id"], drop_late=True, seq_col="arrival"
    )


def sp_llm_chat(src, m):
    fn = getattr(m, "streaming_llm_chat", None) or m.llm_chat_stub
    msgs = _typed(src(), "click").select(
        "user_id", "ts", "event_id",
        F.concat(F.lit("m"), F.col("event_id").cast("string")).alias("value"),
    )
    return fn(msgs, conversation_col="user_id", seq_col="event_id").select(
        "user_id", "event_id", "reply"
    )


def sp_stretch_align(src, m):
    fn = getattr(m, "streaming_stretch_align", None) or m.stretch_align
    chunks = _typed(src(), "click").select(
        "user_id", "ts", "event_id", F.expr(SAMPLES).alias("samples")
    )
    out = fn(
        chunks, keys=["user_id"], seq_col="event_id",
        rate=16_000, chunk_size=16,
    )
    return out.select(
        "user_id", "event_id", "m",
        F.col("aligned").cast("array<double>").alias("aligned"),
    )


def sp_dedup_exact(src, m):
    docs = src().select(
        "event_id", "ts", F.expr(DEDUP_TEXT).alias("text")
    ).filter(F.col("text").isNotNull() & ~F.col("text").startswith(FLUSH_TYPE))
    fn = getattr(m, "streaming_dedup_exact", None)
    if fn is not None:
        return fn(docs, watermark_delay="30 days").select(
            "norm_hash", F.col("event_id").alias("keep_id")
        )
    return m.dedup_exact(docs, id_col="event_id").select(
        "norm_hash", "keep_id"
    )


# paragraph structure derived from the fuzzed events: a per-type intro
# paragraph (40 variants) and a shared tail (7 variants) — duplicate
# classes recur heavily both within and across micro-batches
PARA_TEXT = (
    "concat(event_type, ' intro ', cast(pmod(cast(value * 10 as bigint),"
    " 40) as string), '\\n\\nshared tail ',"
    " cast(pmod(event_id, 7) as string))"
)


def sp_paragraph_dedup(src, m):
    docs = src().select(
        "event_id", "ts", F.expr(PARA_TEXT).alias("text")
    ).filter(F.col("text").isNotNull() & ~F.col("text").startswith(FLUSH_TYPE))
    fn = getattr(m, "streaming_paragraph_dedup", None)
    if fn is not None:
        return fn(docs, id_col="event_id", watermark_delay="30 days").select(
            "para_hash", "event_id", "idx", "para"
        )
    return m.paragraph_dedup_rows(docs, id_col="event_id").select(
        "para_hash", "event_id", "idx", "para"
    )


def sp_interval_join(src, m):
    clicks = _typed(src(), "click").select("user_id", "ts", "value")
    wins = _typed(src(), "purchase").select(
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end_ts"),
        F.col("event_id").alias("window_id"),
    )
    fn = getattr(m, "streaming_interval_join", None)
    if fn is not None:
        out = fn(
            clicks, wins, keys=["user_id"], left_delay="1 hour",
            interval_delay="7 hours", max_span="6 hours",
        )
    else:
        out = m.range_join(clicks, wins, keys=["user_id"], bucket_minutes=120)
    return out.select("window_id", "ts", "value")


# The window specs exclude the flush group on the BATCH side only.
# Putting the same filter on the streaming plan looks symmetric but is
# WRONG: Catalyst pushes a grouping-column predicate through the
# aggregate to the file scan — BELOW the EventTimeWatermark node — so
# the flush row is filtered before the watermark ever sees it and the
# final real windows never close (observed: the last 3 hourly windows
# silently missing). The streaming side needs no filter at all: the
# flush group's own window/session never closes (nothing advances the
# watermark past it), so it can never be emitted in append mode.

def sp_hourly(src, m):
    fn = getattr(m, "streaming_hourly_stats", None)
    if fn is not None:
        return fn(src(), watermark_delay="2 hours")
    return m.events_hourly_stats({"events": src()}).filter(
        F.col("event_type") != FLUSH_TYPE
    )


def sp_sliding(src, m):
    fn = getattr(m, "streaming_sliding_stats", None)
    if fn is not None:
        return fn(src(), watermark_delay="3 hours")
    return m.events_sliding_stats({"events": src()}).filter(
        F.col("event_type") != FLUSH_TYPE
    )


def sp_session(src, m):
    fn = getattr(m, "streaming_session_stats", None)
    if fn is not None:
        return fn(src(), gap_minutes=30, watermark_delay="2 hours").select(
            "user_id", "session_start",
            (F.col("session_end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "session_end"
            ),
            "n_events", "sum_value",
        )
    return m.events_session_windows({"events": src()}, gap_minutes=30).select(
        "user_id", "session_start", "session_end", "n_events", "sum_value"
    ).filter(F.col("user_id") != -1)


SPECS = {
    "last_value_join": sp_last_value_join,
    "gate": sp_gate,
    "gate_fail_closed": sp_gate_fail_closed,
    "pause_state": sp_pause_state,
    "switch": sp_switch,
    "sr_latch": sp_sr_latch,
    "ordered_merge": sp_ordered_merge,
    "llm_chat": sp_llm_chat,
    "stretch_align": sp_stretch_align,
    "dedup_exact": sp_dedup_exact,
    "paragraph_dedup": sp_paragraph_dedup,
    "interval_join": sp_interval_join,
    "hourly_stats": sp_hourly,
    "sliding_stats": sp_sliding,
    "session_stats": sp_session,
}


def _frame(df):
    """Order-insensitive full-frame image: sorted tuples of every row,
    arrays frozen, floats exact (both sides use the same arithmetic —
    integer-unit sums in the window twins, identical op order in
    stretch_align — so no tolerance is needed or wanted)."""
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        rows.append(
            tuple(
                tuple(v) if isinstance(v, list) else v
                for v in (r[c] for c in cols)
            )
        )
    return sorted(rows, key=repr)


def _batch_mod():
    import streamtasks_spark.llmdata.dedup as dedup_mod
    import streamtasks_spark.media.inference as inf_mod
    import streamtasks_spark.operators.chunks as chunks_mod
    import streamtasks_spark.operators.joins as joins_mod
    import streamtasks_spark.operators.stateful as batch_stateful
    import streamtasks_spark.relational.queries as rq

    class BatchMod:
        last_value_join = staticmethod(joins_mod.last_value_join)
        ordered_merge = staticmethod(joins_mod.ordered_merge)
        range_join = staticmethod(joins_mod.range_join)
        gate = staticmethod(batch_stateful.gate)
        pause_state = staticmethod(batch_stateful.pause_state)
        switch = staticmethod(batch_stateful.switch)
        sr_latch = staticmethod(batch_stateful.sr_latch)
        llm_chat_stub = staticmethod(inf_mod.llm_chat_stub)
        stretch_align = staticmethod(chunks_mod.stretch_align)
        dedup_exact = staticmethod(dedup_mod.dedup_exact)
        paragraph_dedup_rows = staticmethod(dedup_mod.paragraph_dedup_rows)
        events_hourly_stats = staticmethod(rq.events_hourly_stats)
        events_sliding_stats = staticmethod(rq.events_sliding_stats)
        events_session_windows = staticmethod(rq.events_session_windows)

    return BatchMod


def _stream_mod():
    import streamtasks_spark.streaming.stateful as stream_stateful
    import streamtasks_spark.streaming.windows as stream_windows

    class StreamMod:
        streaming_last_value_join = staticmethod(
            stream_stateful.streaming_last_value_join
        )
        streaming_gate = staticmethod(stream_stateful.streaming_gate)
        streaming_pause_state = staticmethod(
            stream_stateful.streaming_pause_state
        )
        streaming_switch = staticmethod(stream_stateful.streaming_switch)
        streaming_sr_latch = staticmethod(stream_stateful.streaming_sr_latch)
        streaming_ordered_merge = staticmethod(
            stream_stateful.streaming_ordered_merge
        )
        streaming_llm_chat = staticmethod(stream_stateful.streaming_llm_chat)
        streaming_stretch_align = staticmethod(
            stream_stateful.streaming_stretch_align
        )
        streaming_dedup_exact = staticmethod(
            stream_stateful.streaming_dedup_exact
        )
        streaming_paragraph_dedup = staticmethod(
            stream_stateful.streaming_paragraph_dedup
        )
        streaming_interval_join = staticmethod(
            stream_stateful.streaming_interval_join
        )
        streaming_hourly_stats = staticmethod(
            stream_windows.streaming_hourly_stats
        )
        streaming_sliding_stats = staticmethod(
            stream_windows.streaming_sliding_stats
        )
        streaming_session_stats = staticmethod(
            stream_windows.streaming_session_stats
        )

    return StreamMod


@pytest.mark.parametrize("name", sorted(SPECS))
def test_streaming_twin_matches_batch_frame(name, spark, tmp_path, chunk_dir):
    BatchMod, StreamMod = _batch_mod(), _stream_mod()
    spec = SPECS[name]
    bdf = spec(lambda: batch_events(spark, chunk_dir), BatchMod)
    expect = _frame(bdf)

    sdf = spec(lambda: stream_events(spark, chunk_dir), StreamMod)
    got = _frame(run_stream(spark, sdf, tmp_path))

    assert expect, f"{name}: batch side empty — spec produces no rows"
    assert got == expect, (
        f"{name}: streaming frame != batch frame "
        f"({len(got)} vs {len(expect)} rows)"
    )
