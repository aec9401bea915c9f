#!/usr/bin/env python
"""Port of the reference's examples/fntask.py — the BGR24 "red shifter".

The reference lifts a typed numpy function over raw video chunks into a
task with ``@fntask`` (reference examples/fntask.py:16-20). Here the
same function body becomes a Spark operator with ``@fn_task``: the
``bytes`` annotation maps to a BINARY column, execution is an
Arrow-vectorized pandas UDF, and the "task" runs over a DataFrame of
frame chunks — batch or streaming alike.

Run: python examples/fntask_red_shifter.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamtasks_spark.functions.fntask import fn_task
from streamtasks_spark.session import get_spark

SCALE = 1.2  # reference BGR24RedShifterConfig.scale


@fn_task(vectorized=False)  # per-value: each row is one whole frame blob
def bgr24_red_shifter(image: bytes) -> bytes:
    """Reference examples/fntask.py:17-20, verbatim math: scale the R
    channel of packed BGR24 bytes, clamp to 255."""
    arr = np.frombuffer(image, dtype=np.uint8).reshape((-1, 3)).astype(np.float32)
    flt = np.array([1, 1, SCALE], dtype=np.float32)
    return np.minimum(arr * flt, 255).astype(np.uint8).tobytes()


def main() -> None:
    spark = get_spark("example_fntask")
    # 8 synthetic 4x2 BGR24 frames as binary chunks
    frames = spark.range(8).select(
        F.col("id").alias("frame_id"),
        # 24 raw bytes (8 BGR pixels) from an md5 hex stream (md5 hex is
        # 32 chars = 16 bytes, so take 48 chars of the doubled digest)
        F.expr(
            "unhex(substr(repeat(md5(cast(id as string)), 2), 1, 48))"
        ).alias("data"),
    )
    out = frames.withColumn("shifted", bgr24_red_shifter.column(F.col("data")))
    rows = out.collect()
    for r in rows[:3]:
        before = np.frombuffer(r["data"], np.uint8).reshape(-1, 3)
        after = np.frombuffer(r["shifted"], np.uint8).reshape(-1, 3)
        print(
            f"frame {r['frame_id']}: B,G unchanged={bool((before[:, :2] == after[:, :2]).all())} "
            f"R {before[0, 2]} -> {after[0, 2]}"
        )
    assert all(
        (np.frombuffer(r["data"], np.uint8).reshape(-1, 3)[:, :2]
         == np.frombuffer(r["shifted"], np.uint8).reshape(-1, 3)[:, :2]).all()
        for r in rows
    )
    print(f"ok: {len(rows)} frames red-shifted")


if __name__ == "__main__":
    main()
