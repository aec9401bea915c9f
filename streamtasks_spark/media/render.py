"""Frame rendering / layout operators (reference media/videolayout.py:
79-91, textrenderer.py:57-89, imagerenderer.py:32-49).

Frames are dense row-major ``array<double>`` columns with explicit
width/height parameters (the engine's decoded-frame convention —
SURVEY §1.2 maps raw video chunks to binary + numpy reinterpretation;
per-pixel SQL wants the exploded array form).

- :func:`video_layout` — REAL: place a frame into a larger canvas at an
  offset, pure index arithmetic in a codegen'd transform (replaces the
  reference's numpy slice assignment).
- :func:`text_renderer` — text → frame; the PIL rasterizer is stubbed
  with a deterministic per-character fake, the Arrow stage is real.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def video_layout(
    frames: DataFrame,
    *,
    samples_col: str = "samples",
    out_col: str = "canvas",
    frame_w: int = 4,
    frame_h: int = 4,
    canvas_w: int = 8,
    canvas_h: int = 6,
    x: int = 0,
    y: int = 0,
    background: float = 0.0,
) -> DataFrame:
    """Place each row's frame_w×frame_h frame into a canvas_w×canvas_h
    canvas at offset (x, y); pixels outside the frame get ``background``
    (reference videolayout.py:79-91 without the resize kernel — resize
    is a codec-tier concern). Narrow map, no shuffle."""
    if x + frame_w > canvas_w or y + frame_h > canvas_h:
        raise ValueError("frame does not fit in canvas at this offset")
    expr = (
        f"transform(sequence(0, {canvas_w * canvas_h - 1}), c -> "
        f"if(c % {canvas_w} >= {x} AND c % {canvas_w} < {x + frame_w} "
        f"AND c div {canvas_w} >= {y} AND c div {canvas_w} < {y + frame_h}, "
        f"element_at({samples_col}, "
        f"cast((c div {canvas_w} - {y}) * {frame_w} + (c % {canvas_w} - {x}) + 1 as int)), "
        f"cast({background} as double)))"
    )
    return frames.withColumn(out_col, F.expr(expr))


def text_renderer(
    texts: DataFrame,
    *,
    id_cols: Sequence[str] = ("user_id", "ts"),
    text_col: str = "value",
    width: int = 8,
    height: int = 2,
) -> DataFrame:
    """Text → rendered frame (reference textrenderer.py:57-89, PIL).
    STUB rasterizer: pixel i = (ord of char i mod len) scaled — swap in
    PIL's ``ImageDraw.text`` when available; the Arrow batch stage and
    frame schema are production-real."""
    ids = list(id_cols)
    src = texts.select(*ids, text_col)
    ddl = ", ".join(f"`{c}` {src.schema[c].dataType.simpleString()}" for c in ids)
    n = width * height

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[ids].copy()
            # NULL text renders a blank frame, same as empty —
            # astype(str) would rasterize the literal "None"
            out["frame"] = [
                [float(ord(t[i % len(t)]) % 255) / 255.0 if t else 0.0
                 for i in range(n)]
                for t in pdf[text_col].fillna("")
            ]
            yield out

    return src.mapInPandas(render, f"{ddl}, frame array<double>")


def image_renderer(
    pulse: DataFrame,
    frame: Sequence[float],
) -> DataFrame:
    """ImageRenderer (reference imagerenderer.py:32-49): a static frame
    re-emitted on every pulse tick — constant array literal attached to
    the (rate-source) pulse stream; works identically on batch tick
    tables."""
    arr = F.array(*[F.lit(float(v)) for v in frame])
    return pulse.withColumn("samples", arr)
