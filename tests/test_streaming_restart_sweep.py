"""Checkpoint-recovery sweep over every event-time streaming twin.

The equivalence sweep (test_streaming_equivalence.py) proves each twin
matches its batch counterpart when one query incarnation sees all the
data. This sweep proves the HARDER half of the reference's replay
contract (SURVEY §2.9): the query is STOPPED mid-stream — after the
first half of the chunks — and a NEW incarnation resumes from the
checkpoint over the second half. Latched control values, watermark
positions, stream-stream join buffers, session/window state, and
dedup state must all be recovered, and the union of both runs' append
output must still equal the batch frame exactly — no lost rows
(state forgotten) and no duplicates (offsets replayed).

Both runs use availableNow over a file source whose directory GROWS
between runs; the committed-offset log in the checkpoint is what keeps
run 2 from re-reading run 1's files. Specs are imported from the
equivalence sweep so the two gates can never drift apart.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

# driver-facing default run excludes this sweep (pytest.ini, r12):
# it is the slow tier — run with `-m slow`
pytestmark = pytest.mark.slow

from test_streaming_equivalence import (
    N_CHUNKS,
    SPECS,
    _batch_mod,
    _frame,
    _stream_mod,
    batch_events,
    chunk_dir,  # noqa: F401  (fixture re-export)
)
from streamtasks_spark.core.timeutil import ensure_event_time


def _copy_chunks(chunk_dir, dst, names, mtime_base):
    for i, sub in enumerate(names):
        shutil.copytree(chunk_dir / sub, dst / sub)
        for f in os.listdir(dst / sub):
            t = mtime_base + 10 * i
            os.utime(os.path.join(dst, sub, f), (t, t))


def _run_available_now(df, out_dir, ckpt):
    q = (
        df.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(ckpt))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_streaming_twin_survives_midstream_restart(
    name, spark, tmp_path, chunk_dir
):
    BatchMod, StreamMod = _batch_mod(), _stream_mod()
    src_dir = tmp_path / f"src_{uuid.uuid4().hex[:8]}"
    out_dir, ckpt = tmp_path / "out", tmp_path / "ck"
    src_dir.mkdir()

    chunks = sorted(os.listdir(chunk_dir))  # c00..c07, c99_flush
    assert len(chunks) == N_CHUNKS + 1
    first, second = chunks[: N_CHUNKS // 2], chunks[N_CHUNKS // 2:]

    def stream_src():
        # same construction as the equivalence sweep's stream side but
        # over the growing per-test dir. maxFilesPerTrigger=1 is part of
        # the arrival contract, not a speed knob: one chunk per batch is
        # what makes "first arrival" well-defined for the dedup twin
        # (a multi-chunk batch has arrival TIES, and the state store
        # picks an arbitrary within-batch representative)
        raw = (
            spark.readStream.schema(
                spark.read.parquet(str(chunk_dir / "c00")).schema
            )
            .option("maxFilesPerTrigger", "1")
            .option("recursiveFileLookup", "true")
            .parquet(str(src_dir))
        )
        return ensure_event_time(raw)

    spec = SPECS[name]

    _copy_chunks(chunk_dir, src_dir, first, 1_700_000_000)
    _run_available_now(spec(stream_src, StreamMod), out_dir, ckpt)
    try:
        n_first = spark.read.parquet(str(out_dir)).count()
    except Exception:
        n_first = 0  # nothing emitted before the restart is fine

    _copy_chunks(chunk_dir, src_dir, second, 1_700_001_000)
    _run_available_now(spec(stream_src, StreamMod), out_dir, ckpt)

    expect = _frame(spec(lambda: batch_events(spark, chunk_dir), BatchMod))
    got = _frame(spark.read.parquet(str(out_dir)))
    assert expect, f"{name}: batch side empty — spec produces no rows"
    assert got == expect, (
        f"{name}: restarted streaming frame != batch frame "
        f"({len(got)} vs {len(expect)} rows; {n_first} pre-restart)"
    )
    assert n_first < len(expect), (
        f"{name}: everything emitted before the restart — the split "
        "never exercised recovered state"
    )
