"""Encoder/decoder stages (reference media/codec.py:50-136 and the four
audio/video encoder/decoder tasks, system/tasks/media/*.py).

A codec context is per-stream sequential state, so the Spark shape is:
repartition by the stream key, sort within partitions by event time,
then run an Arrow ``mapInPandas`` stage holding one codec instance per
(partition, stream) — exactly the reference's one-codec-per-topic
discipline (audiodecoder.py:28-57), distributed.

Kernels are pluggable. The default ``RawPcmCodec`` is a REAL, invertible
framing codec (float64 samples ↔ length-prefixed little-endian bytes) so
encode→decode round-trips are byte-exact and testable without media
libraries; a PyAV-backed kernel drops into the same stage when the
library exists (import-gated via :func:`pyav_available`).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pyav_available() -> bool:
    try:  # pragma: no cover - not installed in this environment
        import av  # noqa: F401

        return True
    except ImportError:
        return False


class RawPcmCodec:
    """Invertible framing codec: array<double> ↔ bytes.
    Packet layout: u32 sample count, then f64 little-endian samples.

    ``encode_batch``/``decode_batch`` are the Arrow-stage fast path
    (numpy ``tobytes``/``frombuffer`` instead of per-row struct.pack —
    doubles round-trip bit-exactly either way); a pluggable codec that
    only defines per-row encode/decode still works, the stages fall back
    to a row loop (real codecs are per-packet C calls anyway)."""

    @staticmethod
    def encode(samples: list[float]) -> bytes:
        return struct.pack("<I", len(samples)) + struct.pack(
            f"<{len(samples)}d", *samples
        )

    @staticmethod
    def decode(data: bytes) -> list[float]:
        (n,) = struct.unpack_from("<I", data, 0)
        return list(struct.unpack_from(f"<{n}d", data, 4))

    @staticmethod
    def encode_batch(arrays) -> list[bytes]:
        out = []
        for s in arrays:
            if s is None:
                # np.asarray(None) would yield a 0-d NaN "array" and
                # silently encode a bogus 1-sample packet; fail loudly
                # like the per-row path does
                raise TypeError("encode_batch: samples array is null")
            a = np.asarray(s, dtype="<f8")
            out.append(struct.pack("<I", a.size) + a.tobytes())
        return out

    @staticmethod
    def decode_batch(bufs) -> list[list[float]]:
        out = []
        for b in bufs:
            b = bytes(b)
            (n,) = struct.unpack_from("<I", b, 0)
            out.append(np.frombuffer(b, dtype="<f8", count=n, offset=4).tolist())
        return out


class PyAvAudioCodec:
    """Real audio transcode kernel via PyAV, drop-in for the stages below
    (reference media/codec.py:50-136 transcode path). Import-gated: only
    constructible when ``av`` is present (:func:`pyav_available`).

    Bytes are self-framing (ADTS mux for AAC) so a packet column is a
    plain binary column, same as RawPcmCodec. Lossy codecs do not
    round-trip byte-exactly — the quality gate is spectral similarity,
    mirroring the reference's test_audio_codec.py:10-48."""

    def __init__(self, codec: str = "aac", rate: int = 32000, fmt: str = "adts"):
        self.codec_name = codec
        self.rate = rate
        self.fmt = fmt

    def encode(self, samples: list[float]) -> bytes:
        import io

        import av

        buf = io.BytesIO()
        with av.open(buf, "w", format=self.fmt) as out:
            stream = out.add_stream(self.codec_name, rate=self.rate, layout="mono")
            arr = np.asarray([samples], dtype=np.float32)
            frame = av.AudioFrame.from_ndarray(arr, format="fltp", layout="mono")
            frame.sample_rate = self.rate
            for packet in stream.encode(frame):
                out.mux(packet)
            for packet in stream.encode(None):  # flush
                out.mux(packet)
        return buf.getvalue()

    def decode(self, data: bytes) -> list[float]:
        import io

        import av

        frames = []
        with av.open(io.BytesIO(bytes(data)), "r", format=self.fmt) as inp:
            for frame in inp.decode(audio=0):
                frames.append(frame.to_ndarray())
        if not frames:
            return []
        return np.concatenate(frames, axis=-1).ravel().astype(np.float64).tolist()


def _stream_sorted(
    df: DataFrame, keys: Sequence[str], ts: str, seq_col: str | None
) -> DataFrame:
    """Per-stream codec discipline: co-locate each stream's rows and
    order them by event time before the stateful kernel sees them."""
    order = [F.col(ts).asc()] + ([F.col(seq_col).asc()] if seq_col else [])
    return df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(
        *[F.col(k) for k in keys], *order
    )


def audio_encoder(
    chunks: DataFrame,
    *,
    keys: Sequence[str],
    ts: str = "ts",
    samples_col: str = "samples",
    seq_col: str | None = None,
    codec=RawPcmCodec,
) -> DataFrame:
    """Encode sample chunks into packets (reference audioencoder.py:
    29-72: frames in, MediaPacket out, timestamps carried through).
    Output: keys + ts (+ seq) + data BINARY + is_keyframe (raw PCM:
    every packet is a keyframe)."""
    id_cols = [*keys, ts] + ([seq_col] if seq_col else [])
    src = _stream_sorted(chunks, keys, ts, seq_col).select(
        *id_cols, samples_col
    )
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in id_cols)
    out_schema = f"{ddl}, data binary, is_keyframe boolean"

    batch_fn = getattr(codec, "encode_batch", None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_cols].copy()
            if batch_fn is not None:
                out["data"] = batch_fn(pdf[samples_col])
            else:
                out["data"] = [codec.encode(list(s)) for s in pdf[samples_col]]
            out["is_keyframe"] = True
            yield out

    return src.mapInPandas(run, out_schema)


def audio_decoder(
    packets: DataFrame,
    *,
    keys: Sequence[str],
    ts: str = "ts",
    data_col: str = "data",
    seq_col: str | None = None,
    codec=RawPcmCodec,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Decode packets back to sample chunks (reference audiodecoder.py:
    28-57). Output: keys + ts (+ seq) + keep_cols + samples
    array<double>."""
    id_cols = [*keys, ts] + ([seq_col] if seq_col else []) + list(keep_cols)
    src = _stream_sorted(packets, keys, ts, seq_col).select(*id_cols, data_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in id_cols)
    out_schema = f"{ddl}, samples array<double>"

    batch_fn = getattr(codec, "decode_batch", None)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[id_cols].copy()
            if batch_fn is not None:
                out["samples"] = batch_fn(pdf[data_col])
            else:
                out["samples"] = [codec.decode(bytes(b)) for b in pdf[data_col]]
            yield out

    return src.mapInPandas(run, out_schema)
