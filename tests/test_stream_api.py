"""Stream fluent API: must be a zero-overhead veneer over the
functional operators — same results as direct calls."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamtasks_spark.core import Stream
from streamtasks_spark.operators.stateful import gate
from streamtasks_spark.session import read_parquet

SF_DIR = "/root/testdata/sf0.001"


def test_stream_gate_equals_functional(spark):
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    s = Stream(ev, keys=["user_id"], seq_col="event_id")
    data = s.filter("event_type IN ('click', 'view')")
    ctl = s.filter("event_type = 'purchase'").threshold(25)
    fluent = {r["event_id"] for r in data.gate(ctl).to_df().collect()}

    direct = {
        r["event_id"]
        for r in gate(
            data.df, ctl.df, keys=["user_id"], seq_col="event_id"
        ).collect()
    }
    assert fluent == direct and fluent


def test_stream_chain_calculate_and_buffer(spark):
    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    out = (
        Stream(ev, keys=["user_id"], seq_col="event_id")
        .filter("event_type = 'click'")
        .calculate("v * 2 + 1", {"v": F.col("value")})
        .buffer(delay_ms=1000)
        .to_df()
    )
    row = out.orderBy("event_id").first()
    src = ev.filter(F.col("event_type") == "click").orderBy("event_id").first()
    assert row["value"] == src["value"] * 2 + 1
    assert (row["ts"] - src["ts"]).total_seconds() == 1.0


def test_stream_new_fluent_ops_equal_functional(spark):
    from streamtasks_spark.operators.chunks import audio_chunker
    from streamtasks_spark.operators.stateful import pause_state, sr_latch, switch

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    s = Stream(ev, keys=["user_id"], seq_col="event_id")
    clicks = s.filter("event_type = 'click'")
    errors = s.filter("event_type = 'error'").threshold(25)
    purchases = s.filter("event_type = 'purchase'").threshold(25)

    # with_pause
    fluent = {
        (r["event_id"], r["paused"])
        for r in clicks.with_pause(errors).to_df().collect()
    }
    direct = {
        (r["event_id"], r["paused"])
        for r in pause_state(
            clicks.df, errors.df, keys=["user_id"], seq_col="event_id"
        ).collect()
    }
    assert fluent == direct and fluent

    # latch
    fl = sorted(
        (r["user_id"], r["ts"], r["value"])
        for r in purchases.latch(errors).to_df().collect()
    )
    dl = sorted(
        (r["user_id"], r["ts"], r["value"])
        for r in sr_latch(
            purchases.df, errors.df, keys=["user_id"], seq_col="event_id"
        ).collect()
    )
    assert fl == dl and fl

    # switch (static)
    views = s.filter("event_type = 'view'")
    errs_data = s.filter("event_type = 'error'")
    fs = {
        r["event_id"]
        for r in Stream.switch(
            [(views, clicks), (errs_data, purchases)]
        ).to_df().collect()
    }
    ds = {
        r["event_id"]
        for r in switch(
            [(views.df, clicks.df), (errs_data.df, purchases.df)],
            keys=["user_id"],
            seq_col="event_id",
        ).collect()
    }
    assert fs == ds and fs

    # chunk
    chunked = clicks.select_value(
        "transform(sequence(1, 16), i -> cast(value * i as double))", "samples"
    )
    fc = {
        (r["user_id"], r["chunk_id"])
        for r in chunked.chunk(24).to_df().collect()
    }
    dc = {
        (r["user_id"], r["chunk_id"])
        for r in audio_chunker(
            chunked.df, keys=["user_id"], seq_col="event_id", chunk_size=24
        ).collect()
    }
    assert fc == dc and fc


def test_stream_publish_registers_named_topic(spark):
    from streamtasks_spark.session import named_input

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    Stream(ev).publish("stream_api_topic")
    assert named_input(spark, "stream_api_topic").count() == ev.count()


def test_stream_requires_ts_column(spark):
    import pytest

    with pytest.raises(ValueError, match="event-time"):
        Stream(spark.range(3))
