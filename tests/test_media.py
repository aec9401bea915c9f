"""Media tier tests — modeled on the reference's round-trip strategy
(tests/media/test_containers.py, test_audio_codec.py): encode→decode and
mux→demux must reproduce the input exactly (raw PCM framing is
lossless, so the threshold is equality, not spectral similarity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.media.codec import RawPcmCodec, audio_decoder, audio_encoder
from streamtasks_spark.media.container import input_container, output_container

SAMPLES = "transform(sequence(1, 16), i -> (value * i) % 7 - 3)"


@pytest.fixture(scope="module")
def chunks(spark):
    from streamtasks_spark.session import read_parquet

    ev = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    return (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id", F.expr(SAMPLES).alias("samples"))
        .cache()
    )


def test_raw_pcm_codec_inverts():
    samples = [1.5, -2.25, 0.0, 3.125]
    assert RawPcmCodec.decode(RawPcmCodec.encode(samples)) == samples


def test_encode_decode_round_trip(spark, chunks):
    packets = audio_encoder(
        chunks, keys=["user_id"], seq_col="event_id"
    )
    decoded = audio_decoder(
        packets, keys=["user_id"], seq_col="event_id"
    )
    orig = {r["event_id"]: list(r["samples"]) for r in chunks.collect()}
    back = {r["event_id"]: list(r["samples"]) for r in decoded.collect()}
    assert back == orig  # lossless framing → exact equality


def test_container_mux_demux_round_trip(spark, chunks, tmp_path):
    a = chunks.select(
        "ts", F.col("event_id").alias("seq"),
        F.lit(0.04).alias("duration"),
        F.expr("cast(cast(event_id as string) as binary)").alias("data"),
        (F.col("event_id") % 5 == 0).alias("is_keyframe"),
    )
    b = a.withColumn("seq", F.col("seq") + 1_000_000)
    path = str(tmp_path / "container")
    output_container({"audio0": a, "video0": b}, path)

    tracks = input_container(spark, path)
    assert set(tracks) == {"audio0", "video0"}
    got_a = {r["seq"] for r in tracks["audio0"].collect()}
    assert got_a == {r["seq"] for r in a.collect()}
    # mux order is a complete, gap-free global interleave
    muxed = spark.read.parquet(path)
    orders = sorted(r["mux_order"] for r in muxed.collect())
    assert orders == list(range(1, len(orders) + 1))


def test_asr_tts_stubs_deterministic(spark, chunks):
    from streamtasks_spark.media.inference import asr_stub, tts_stub

    out1 = asr_stub(chunks, id_cols=("event_id",)).collect()
    out2 = asr_stub(chunks, id_cols=("event_id",)).collect()
    assert {r["event_id"]: r["text"] for r in out1} == {
        r["event_id"]: r["text"] for r in out2
    }
    texts = spark.createDataFrame(
        [(1, 100, "hello"), (1, 200, "")], ["user_id", "ts", "value"]
    )
    waves = tts_stub(texts).collect()
    by_ts = {r["ts"]: r["samples"] for r in waves}
    assert len(by_ts[100]) == 16 and by_ts[200] == [0.0] * 16


def test_llm_chat_stub_is_stateful_per_conversation(spark):
    from streamtasks_spark.media.inference import llm_chat_stub

    rows = [
        (1, 100, 1, "aa"), (1, 200, 2, "bbb"), (1, 300, 3, "c"),
        (2, 150, 4, "zzzz"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "seq", "value"])
    out = llm_chat_stub(df, seq_col="seq")
    got = {r["seq"]: r["reply"] for r in out.collect()}
    # conversation 1 accumulates history; conversation 2 starts fresh
    assert got[1] == "reply#1:2"
    assert got[2] == "reply#2:5"
    assert got[3] == "reply#3:6"
    assert got[4] == "reply#1:4"


def test_text_renderer_stub_shapes(spark):
    from streamtasks_spark.media.render import text_renderer

    df = spark.createDataFrame(
        [(1, 100, "hi"), (1, 200, "")], ["user_id", "ts", "value"]
    )
    out = {r["ts"]: r["frame"] for r in text_renderer(df).collect()}
    assert len(out[100]) == 16 and len(out[200]) == 16
    assert out[200] == [0.0] * 16
    assert out[100][0] == (ord("h") % 255) / 255.0


def test_image_renderer_constant_frame(spark):
    from streamtasks_spark.media.render import image_renderer

    ticks = spark.createDataFrame([(1,), (2,), (3,)], ["tick"])
    out = image_renderer(ticks, [0.5, 1.0]).collect()
    assert all(list(r["samples"]) == [0.5, 1.0] for r in out)


def test_named_input_output_registry(spark):
    from streamtasks_spark.session import (
        list_named_topics,
        named_input,
        named_output,
    )

    named_output(spark.range(5), "topic_numbers")
    got = named_input(spark, "topic_numbers")
    assert got.count() == 5
    assert "topic_numbers" in list_named_topics(spark)


def test_ui_input_stream_reads_control_changes(spark, tmp_path):
    import uuid

    from streamtasks_spark.streaming.sources import ui_input_stream, ui_set_value

    d = str(tmp_path / "ctl")
    ui_set_value(d, "2024-01-01 00:00:00", 0.25)
    ui_set_value(d, "2024-01-01 00:01:00", 0.75)
    name = f"ui_{uuid.uuid4().hex[:8]}"
    q = (
        ui_input_stream(spark, d)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    vals = sorted(r["value"] for r in spark.table(name).collect())
    assert vals == [0.25, 0.75]


def test_capture_adapters_produce_chunk_tables(spark):
    from streamtasks_spark.media.capture import (
        audio_input,
        audio_output,
        video_input,
    )

    a = audio_input(spark, n_chunks=3, chunk_size=8)
    rows = a.collect()
    assert len(rows) == 3 and all(len(r["samples"]) == 8 for r in rows)
    # deterministic fake: same call, same signal
    assert [r["samples"] for r in audio_input(spark, n_chunks=3, chunk_size=8).collect()] == [
        r["samples"] for r in rows
    ]
    v = video_input(spark, n_frames=2, width=3, height=2).collect()
    assert len(v) == 2 and all(len(r["samples"]) == 6 for r in v)
    assert v[0]["width"] == 3 and v[0]["height"] == 2
    assert audio_output(a) == 24


@pytest.mark.skipif(
    not __import__("streamtasks_spark.media.codec", fromlist=["pyav_available"]).pyav_available(),
    reason="PyAV not installed in this environment",
)
def test_pyav_aac_round_trip_spectral():
    """Reference quality gate (tests/media/test_audio_codec.py:10-48):
    a lossy encode->decode round trip must preserve the signal's dominant
    frequency (byte equality is impossible for AAC)."""
    import numpy as np

    from streamtasks_spark.media.codec import PyAvAudioCodec

    rate = 32000
    codec = PyAvAudioCodec("aac", rate=rate)
    t = np.arange(8192) / rate
    sig = np.sin(2 * np.pi * 1000.0 * t)
    back = np.asarray(codec.decode(codec.encode(sig.tolist())))
    assert back.size >= 4096  # decoder produced real audio

    def dominant_hz(x):
        spectrum = np.abs(np.fft.rfft(x * np.hanning(x.size)))
        return np.argmax(spectrum) * rate / x.size

    assert abs(dominant_hz(back) - 1000.0) < 50.0
