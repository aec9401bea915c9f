"""Multimodal (binary) column plumbing for LLM training-data pipelines.

Images/audio/video are opaque ``binary`` columns plus typed metadata
(SURVEY §1.2 MediaMessage ≈ ``ts TIMESTAMP, data BINARY, is_keyframe
BOOLEAN`` — reference media/packet.py:6-17). This module provides the
Spark-side plumbing — schemas, Arrow-batched decode stages, per-stream
partition discipline — with the actual codec kernels STUBBED (this
container has no image/audio libraries): :func:`decode_image_stub`
"decodes" deterministically from the header bytes, so the whole Arrow
path is real and oracle-checkable, and swapping in PIL/ffmpeg later
changes one inner function.

- :func:`binary_meta` — size/digest metadata, pure JVM exprs.
- :func:`decode_image_stub` — ``mapInPandas`` Arrow-batched decode:
  bytes → (width, height, n_pixels). The REAL library call sits behind
  ``_decode_one``; the stub derives dimensions from the first two bytes.
- :func:`frame_sample` — every Nth chunk per stream key (the decode /
  frame-sample preprocessing pattern), pure window logic.

Scale: decode is the canonical Pandas-UDF slow path — Arrow batches,
no per-row Python, and the partitioning key (stream id) keeps any
per-stream codec state local (repartition + sortWithinPartitions before
any stateful codec stage).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DECODE_SCHEMA = "width INT, height INT, n_pixels BIGINT"


def _out_schema(df: DataFrame, id_cols: Sequence[str], payload: str) -> str:
    """DDL schema string: the id columns (types taken from ``df``)
    followed by the stage's payload columns."""
    ids = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in id_cols
    )
    return f"{ids}, {payload}"


def binary_meta(
    df: DataFrame, *, bin_col: str = "data"
) -> DataFrame:
    """Byte-size + md5 digest metadata for a binary column — JVM-side."""
    return df.withColumn("n_bytes", F.length(F.col(bin_col))).withColumn(
        "digest", F.md5(F.col(bin_col))
    )


def _decode_one(data: bytes) -> tuple[int, int]:
    """STUB decode kernel — deterministic fake: dimensions from the first
    two header bytes. Replace with e.g. ``PIL.Image.open(BytesIO(data))``
    when the imaging libraries are available; everything around this
    function (Arrow batching, schema, partitioning) is production-real."""
    if len(data) < 2:
        raise NotImplementedError(
            "real image decode not available in this environment; "
            "stub needs >= 2 header bytes"
        )
    return data[0] + 1, data[1] + 1


def decode_image_stub(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    bin_col: str = "data",
) -> DataFrame:
    """Arrow-batched decode stage: (ids..., data BINARY) → (ids...,
    width, height, n_pixels) via ``mapInPandas``. One narrow pass, no
    shuffle; the Python boundary is per Arrow batch, never per row."""
    out_schema = _out_schema(df, id_cols, DECODE_SCHEMA)
    ids = list(id_cols)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payload → NULL dims, row kept (matches the oracle's
            # md5(NULL) propagation); a 100 TB corpus WILL have them
            dims = [
                _decode_one(bytes(b)) if b is not None else (None, None)
                for b in pdf[bin_col]
            ]
            out = pdf[ids].copy()
            out["width"] = [w for w, _ in dims]
            out["height"] = [h for _, h in dims]
            out["n_pixels"] = [
                w * h if w is not None else None for w, h in dims
            ]
            yield out

    return df.select(*ids, bin_col).mapInPandas(decode_batches, out_schema)


def frame_sample(
    df: DataFrame,
    *,
    keys: Sequence[str] = (),
    ts: str = "ts",
    every: int = 5,
    seq_col: str | None = None,
) -> DataFrame:
    """Keep every ``every``-th row per stream key in event-time order —
    the frame-sampling preprocessing step (decode-side analog of the
    reference's frame-rate conversion, media/video.py:130-164)."""
    order = [F.col(ts).asc()]
    if seq_col is not None:
        order.append(F.col(seq_col).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % every == 0)
        .drop("__rn")
    )


RESIZE_SCHEMA = "width INT, height INT, data_hex STRING"
FEATURES_SCHEMA = (
    "n_bytes INT, sum_bytes BIGINT, min_byte INT, max_byte INT, n_distinct INT"
)


def resize_image_stub(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    bin_col: str = "data",
    stride: int = 2,
) -> DataFrame:
    """Arrow-batched resize stage: (ids..., data BINARY) → (ids...,
    width, height, data_hex) — the decode→resize preprocessing step of
    an image pipeline. STUB kernel (no imaging libs in this container):
    nearest-neighbor ≈ byte subsampling — output dims are the header
    dims divided by ``stride`` (ceil), the payload keeps every
    ``stride``-th body byte, hex-encoded so the DuckDB oracle can
    reproduce it from substrings. Swapping in a real kernel
    (``PIL.Image.resize``) changes only the inner loop; the Spark-side
    shape — narrow mapInPandas, no shuffle, Arrow batch boundary — is
    production-real."""
    ids = list(id_cols)
    out_schema = _out_schema(df, ids, RESIZE_SCHEMA)

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, hexes = [], [], []
            for b in pdf[bin_col]:
                if b is None:  # NULL payload → NULL outputs, row kept
                    ws.append(None)
                    hs.append(None)
                    hexes.append(None)
                    continue
                b = bytes(b)
                w, h = _decode_one(b)
                ws.append(-(-w // stride))
                hs.append(-(-h // stride))
                hexes.append(b[2::stride].hex())
            out = pdf[ids].copy()
            out["width"] = ws
            out["height"] = hs
            out["data_hex"] = hexes
            yield out

    return df.select(*ids, bin_col).mapInPandas(resize_batches, out_schema)


def extract_features_stub(
    df: DataFrame,
    *,
    id_cols: Sequence[str] = ("doc_id",),
    bin_col: str = "data",
) -> DataFrame:
    """Arrow-batched feature-extraction stage: (ids..., data BINARY) →
    (ids..., integer feature columns) — the embed/featurize step of a
    multimodal pipeline. STUB kernel: exact integer byte statistics
    (sum, min, max, distinct count), so the oracle is bit-exact with no
    float formatting traps; a real model (CLIP image encoder etc.) drops
    into the same mapInPandas slot returning a float vector instead."""
    ids = list(id_cols)
    out_schema = _out_schema(df, ids, FEATURES_SCHEMA)

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # NULL payload → all-NULL stats, row kept
            rows = [
                np.frombuffer(bytes(b), dtype=np.uint8) if b is not None else None
                for b in pdf[bin_col]
            ]
            out = pdf[ids].copy()
            out["n_bytes"] = [a.size if a is not None else None for a in rows]
            out["sum_bytes"] = [int(a.sum()) if a is not None else None for a in rows]
            out["min_byte"] = [
                int(a.min()) if a is not None and a.size else None for a in rows
            ]
            out["max_byte"] = [
                int(a.max()) if a is not None and a.size else None for a in rows
            ]
            out["n_distinct"] = [
                int(np.unique(a).size) if a is not None else None for a in rows
            ]
            yield out

    return df.select(*ids, bin_col).mapInPandas(feature_batches, out_schema)
