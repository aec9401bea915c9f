"""Simulator-pattern permutation tests for the STATEFUL streaming twins.

The reference's Simulator (/root/reference/tests/sim.py:78-137) walks
every permutation of an event alphabet through the live operator and
checks each step against a hand-written model. The batch variant lives
in test_permutation_sim.py (every permutation = one key, one job); this
file drives the same permutation space through the STREAMING twins with
every event in its OWN micro-batch — ``maxFilesPerTrigger=1`` over one
file per sequence position — so every state transition crosses a
micro-batch boundary and must be carried by applyInPandasWithState
state, not by intra-batch sorting.

Timestamps are strictly increasing per key (the reference's topics are
nondecreasing per stream, SURVEY §1.3, and append-mode streaming cannot
retroactively apply an equal-ts control that arrives in a LATER
micro-batch — the equal-ts priority rules are pinned batch-side in
test_permutation_sim.py's colliding mode)."""

from __future__ import annotations

import uuid
from datetime import datetime, timezone
from itertools import permutations

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.operators.stateful import gate, sr_latch
from streamtasks_spark.streaming.stateful import (
    streaming_gate,
    streaming_sr_latch,
)

ALPHABET = [
    {"src": "data", "value": 0.0},
    {"src": "data", "value": 1.0},
    {"src": "ctl", "value": 1.0},
    {"src": "ctl", "value": 0.0},
    {"src": "ctl", "value": 0.51},
]

SR_ALPHABET = [
    {"src": "set", "value": 1.0},
    {"src": "set", "value": 0.0},
    {"src": "reset", "value": 1.0},
    {"src": "reset", "value": 0.0},
]


def ms(x: int) -> datetime:
    return datetime.fromtimestamp(x / 1000.0, tz=timezone.utc).replace(tzinfo=None)


def perm_rows(alphabet):
    """One key per permutation, strictly increasing ts, seq = position."""
    rows = []
    for pi, perm in enumerate(permutations(range(len(alphabet)))):
        for i, ev_idx in enumerate(perm):
            rows.append(
                {
                    "key": f"p{pi}",
                    "seq": i,
                    "ts": ms(1_000_000 + 1000 * i),
                    **alphabet[ev_idx],
                }
            )
    return rows


def write_per_position(spark, rows, out_dir, n_positions):
    """One parquet file per sequence position: with maxFilesPerTrigger=1
    each position becomes its own micro-batch across ALL keys at once."""
    df = spark.createDataFrame(rows)
    for i in range(n_positions):
        df.filter(F.col("seq") == i).coalesce(1).write.parquet(
            str(out_dir / f"pos={i:02d}")
        )
    return df


def stream_positions(spark, schema, out_dir):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(out_dir))
    )


def run_to_memory(spark, df, tmp_path):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.table(name)


def test_streaming_gate_every_permutation_every_batch_boundary(
    spark, tmp_path
):
    rows = perm_rows(ALPHABET)
    src_dir = tmp_path / "gate_perm"
    df = write_per_position(spark, rows, src_dir, len(ALPHABET))

    expect = {
        (r["key"], r["seq"])
        for r in gate(
            df.filter(F.col("src") == "data").drop("src"),
            df.filter(F.col("src") == "ctl").drop("src"),
            keys=["key"],
            seq_col="seq",
        ).collect()
    }

    s = stream_positions(spark, df.schema, src_dir)
    out = streaming_gate(
        s.filter(F.col("src") == "data").drop("src"),
        s.filter(F.col("src") == "ctl").drop("src"),
        keys=["key"],
        seq_col="seq",
    )
    got = {
        (r["key"], r["seq"])
        for r in run_to_memory(spark, out, tmp_path).collect()
    }
    assert got == expect
    assert expect  # alphabet must open some gates


def test_streaming_sr_latch_every_permutation_every_batch_boundary(
    spark, tmp_path
):
    rows = perm_rows(SR_ALPHABET)
    src_dir = tmp_path / "sr_perm"
    df = write_per_position(spark, rows, src_dir, len(SR_ALPHABET))

    def split(d):
        return (
            d.filter(F.col("src") == "set").drop("src"),
            d.filter(F.col("src") == "reset").drop("src"),
        )

    s_b, r_b = split(df)
    expect = sorted(
        (r["key"], r["ts"], r["value"])
        for r in sr_latch(s_b, r_b, keys=["key"], seq_col="seq").collect()
    )

    stream = stream_positions(spark, df.schema, src_dir)
    s_s, r_s = split(stream)
    out = streaming_sr_latch(s_s, r_s, keys=["key"], seq_col="seq")
    got = sorted(
        (r["key"], r["ts"], r["value"])
        for r in run_to_memory(spark, out, tmp_path).collect()
    )
    assert got == expect
    assert expect


FAIL_ALPHABET = [
    {"src": "data", "value": 1337.0},
    {"src": "ctl", "value": 1.0},
    {"src": "ctl", "value": 0.0},
    {"src": "ctl", "value": None},  # invalid control message
]


def test_streaming_gate_fail_closed_every_permutation(spark, tmp_path):
    """GateFailMode.CLOSED across micro-batch boundaries: the invalid
    marker must latch in state (a later batch's data row is still
    blocked until a valid control arrives)."""
    rows = perm_rows(FAIL_ALPHABET)
    src_dir = tmp_path / "gate_fail_perm"
    df = write_per_position(spark, rows, src_dir, len(FAIL_ALPHABET))

    expect = {
        (r["key"], r["seq"])
        for r in gate(
            df.filter(F.col("src") == "data").drop("src"),
            df.filter(F.col("src") == "ctl").drop("src"),
            keys=["key"],
            seq_col="seq",
            fail_mode="closed",
        ).collect()
    }

    s = stream_positions(spark, df.schema, src_dir)
    out = streaming_gate(
        s.filter(F.col("src") == "data").drop("src"),
        s.filter(F.col("src") == "ctl").drop("src"),
        keys=["key"],
        seq_col="seq",
        fail_mode="closed",
    )
    got = {
        (r["key"], r["seq"])
        for r in run_to_memory(spark, out, tmp_path).collect()
    }
    assert got == expect
    assert expect
