#!/usr/bin/env python
"""Per-twin micro-batch state-cost profile (r12 — VERDICT r11 item 3).

For each STATEFUL foreachBatch twin (the six whose per-batch work
touches durable state: minhash/bloom/semantic index twins, the
HLL/CMS sketch twins, and the IvfPqIndex ingest twin), feed B equal
micro-batches through a one-file-per-trigger parquet source and report
the per-batch trigger durations from the engine's own progress
metrics, plus the durable-state row count after the run.

What the curve means: a twin whose per-batch time GROWS with batch
index pays O(history) per batch (state read/rewrite or
join-against-history); a flat curve is per-batch work only. The
sketch twins (approx_distinct, heavy_hitters) have sketch-BOUNDED
state (<= 2^p / depth*width rows), so any fixed per-batch state cost
there is pure scheduler/JVM overhead of the read-merge-rewrite jobs —
the r11 deferred item this profile quantifies.

Usage: python scripts/profile_stream_state.py [--batches=8] [--rows=500]
       [twin ...]   (default: all six)
One JSON line per twin on stdout.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamtasks_spark.session import get_spark  # noqa: E402


def _mk_docs(spark, n_rows: int, batch: int, dst: str) -> None:
    """One parquet file per batch with forced mtime order; texts with
    controlled overlap (every 5th doc repeats an earlier sentence) so
    the dedup twins see realistic hit rates."""
    df = spark.range(batch * n_rows, (batch + 1) * n_rows).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick document number "),
            (F.col("id") % 200).cast("string"),
            F.lit(" carries payload "),
            F.when(F.col("id") % 5 == 0, F.lit("shared boilerplate tail"))
            .otherwise(F.md5(F.col("id").cast("string"))),
        ).alias("text"),
    )
    sub = os.path.join(dst, f"b{batch:03d}")
    df.coalesce(1).write.parquet(sub)
    t = 1_700_000_000 + 10 * batch
    for f in os.listdir(sub):
        os.utime(os.path.join(sub, f), (t, t))


def _mk_vecs(spark, n_rows: int, batch: int, dst: str) -> None:
    dim = 16
    df = spark.range(batch * n_rows, (batch + 1) * n_rows).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {dim}), i -> "
            "cast(pmod(id * 37 + i * 101, 97) as double) / 97.0 - 0.5)"
        ).alias("embedding"),
    )
    sub = os.path.join(dst, f"b{batch:03d}")
    df.coalesce(1).write.parquet(sub)
    t = 1_700_000_000 + 10 * batch
    for f in os.listdir(sub):
        os.utime(os.path.join(sub, f), (t, t))


def _source(spark, path: str, schema: str):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def _state_rows(spark, path: str) -> int | None:
    from streamtasks_spark.llmdata.dedup import snapshot_read

    try:
        df = snapshot_read(spark, path)
        return None if df is None else df.count()
    except Exception:
        return None


def specs(td: str):
    from streamtasks_spark.streaming import stateful as st

    docs_schema = "doc_id bigint, text string"
    vec_schema = "vec_id bigint, embedding array<double>"
    return {
        "approx_distinct": dict(
            mk=_mk_docs, schema=docs_schema,
            start=lambda s: st.streaming_approx_distinct(
                s, state_path=f"{td}/ad/state",
                estimates_path=f"{td}/ad/out", checkpoint=f"{td}/ad/ck",
                p=5,
            ),
            state=f"{td}/ad/state",
        ),
        "heavy_hitters": dict(
            mk=_mk_docs, schema=docs_schema,
            start=lambda s: st.streaming_heavy_hitters(
                s, state_path=f"{td}/hh/state",
                reports_path=f"{td}/hh/out", checkpoint=f"{td}/hh/ck",
                width=64, depth=4,
            ),
            state=f"{td}/hh/state",
        ),
        "bloom_dedup": dict(
            mk=_mk_docs, schema=docs_schema,
            start=lambda s: st.streaming_bloom_dedup(
                s, index_path=f"{td}/bl/index", flags_path=f"{td}/bl/out",
                checkpoint=f"{td}/bl/ck", m_bits=1 << 16,
            ),
            state=f"{td}/bl/index/bits",
        ),
        "dedup_minhash": dict(
            mk=_mk_docs, schema=docs_schema,
            start=lambda s: st.streaming_dedup_minhash(
                s, index_path=f"{td}/mh/index", pairs_path=f"{td}/mh/out",
                checkpoint=f"{td}/mh/ck",
            ),
            state=f"{td}/mh/index/postings",
        ),
        "semantic_dedup": dict(
            mk=_mk_vecs, schema=vec_schema,
            start=lambda s: st.streaming_semantic_dedup(
                s, index_path=f"{td}/sd/index",
                verdicts_path=f"{td}/sd/out", checkpoint=f"{td}/sd/ck",
                dim=16, n_cells=4,
            ),
            state=f"{td}/sd/index/kept",
        ),
        "ann_ingest": dict(
            mk=_mk_vecs, schema=vec_schema,
            start=lambda s: st.streaming_ann_ingest(
                s, index_path=f"{td}/ai/index",
                reports_path=f"{td}/ai/out", checkpoint=f"{td}/ai/ck",
                dim=16, n_cells=4, m_sub=4, n_codes=4,
            ),
            state=f"{td}/ai/index/codes",
        ),
    }


def main() -> int:
    batches = 8
    rows = 500
    names = []
    for a in sys.argv[1:]:
        if a.startswith("--batches="):
            batches = int(a.split("=", 1)[1])
        elif a.startswith("--rows="):
            rows = int(a.split("=", 1)[1])
        else:
            names.append(a)

    spark = get_spark("profile_stream_state", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="stream_state_prof_")
    try:
        sp = specs(root)
        for name in names or sp:
            s = sp[name]
            src_dir = os.path.join(root, name, "src")
            os.makedirs(src_dir, exist_ok=True)
            for b in range(batches):
                s["mk"](spark, rows, b, src_dir)
            t0 = time.perf_counter()
            q = s["start"](_source(spark, src_dir, s["schema"]))
            try:
                q.processAllAvailable()
            finally:
                wall = time.perf_counter() - t0
                prog = [json.loads(p.json) for p in q.recentProgress]
                q.stop()
            per_batch = [
                round(p["durationMs"].get("triggerExecution", 0) / 1e3, 3)
                for p in prog
                if p.get("numInputRows", 0) > 0
            ]
            out = {
                "twin": name,
                "rows_per_batch": rows,
                "n_batches": len(per_batch),
                "per_batch_s": per_batch,
                "first_s": per_batch[0] if per_batch else None,
                "last_s": per_batch[-1] if per_batch else None,
                "wall_s": round(wall, 2),
                "state_rows": _state_rows(spark, s["state"]),
            }
            print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
