"""The r11 scale-adaptive `spread`: a scan that already spans at least
the target partition count in files keeps its layout (no repartition
shuffle — at 100 TB that shuffle moves every corpus byte to REDUCE
parallelism); a single-file scan still gets the full-parallelism
spread. Results are partition-independent either way — pinned here on
a representative shuffle-heavy operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.llmdata import dedup


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text body "), (F.col("id") % 37).cast("string"))
        .alias("text"),
    )


def test_single_file_scan_is_spread(spark, tmp_path):
    p = str(tmp_path / "one")
    _docs(spark).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) == 1
    out = dedup.spread(df, "doc_id")
    n = max(spark.sparkContext.defaultParallelism, 8)
    assert "Repartition" in out._jdf.queryExecution().analyzed().toString()
    assert out.rdd.getNumPartitions() == n


def test_many_file_scan_keeps_layout(spark, tmp_path):
    n = max(spark.sparkContext.defaultParallelism, 8)
    p = str(tmp_path / "many")
    _docs(spark).repartition(n + 4).write.parquet(p)
    df = spark.read.parquet(p)
    assert len(df.inputFiles()) >= n
    out = dedup.spread(df, "doc_id")
    assert "Repartition" not in out._jdf.queryExecution().analyzed().toString()
    # keyless form skips identically
    out2 = dedup.spread(df)
    assert "Repartition" not in out2._jdf.queryExecution().analyzed().toString()


def test_local_relation_keeps_spread(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    out = dedup.spread(df, "doc_id")
    assert "Repartition" in out._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("layout", ["one", "many"])
def test_operator_results_layout_independent(spark, tmp_path, layout):
    """dedup_exact (hash + groupBy + canonical-keep) returns identical
    rows whether the corpus arrived spread or already-parallel."""
    p = str(tmp_path / layout)
    d = _docs(spark)
    (d.coalesce(1) if layout == "one" else d.repartition(40)).write.parquet(p)
    got = sorted(
        tuple(r) for r in dedup.dedup_exact(spark.read.parquet(p)).collect()
    )
    ref = sorted(tuple(r) for r in dedup.dedup_exact(d).collect())
    assert got == ref
