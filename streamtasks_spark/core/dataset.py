"""Dataset output management — the write side of a 100 TB pipeline.

A training-data pipeline's output is a sharded parquet dataset, and the
two classic failure modes at scale are the small-files problem (one file
per task × thousands of tasks × hundreds of partitions) and its inverse
(one 2 TB file nothing can parallelize over). :func:`write_dataset`
plans the shard count from the OPTIMIZER'S size estimate — no extra
pass over the data — and aligns the pre-write shuffle with the
partition columns so every output directory receives locally-sorted,
right-sized files.

Reference parity: the reference's OutputContainer writes one muxed
media container (`/root/reference/streamtasks/system/tasks/media/
outputcontainer.py`); the Spark-scale analog of "produce a consumable
artifact" is a partitioned parquet dataset with bounded file sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def plan_shards(
    df: DataFrame,
    *,
    target_file_mb: int = 256,
    max_shards: int = 100_000,
) -> tuple[int, int]:
    """(n_shards, estimated_bytes) from the optimized logical plan's
    size statistic. The estimate is Catalyst's (scan sizes × selectivity
    heuristics) — free at plan time, no data pass. It can be off by a
    small factor; ``maxRecordsPerFile`` in :func:`write_dataset` is the
    hard backstop against under-estimation, and AQE coalescing absorbs
    over-estimation."""
    est = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    target = max(1, target_file_mb) * (1 << 20)
    n = max(1, min(max_shards, -(-est // target)))
    return n, est


def write_dataset(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    sort_within: Sequence[str] = (),
    target_file_mb: int = 256,
    max_records_per_file: int | None = 5_000_000,
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` as a size-managed parquet dataset and return the
    plan manifest ``{path, n_shards, est_bytes, partition_by}``.

    Shape at scale:
    - shard count from :func:`plan_shards` (optimizer estimate ÷
      target file size), clamped to [1, 100k];
    - when partitioned, the pre-write exchange hashes on the PARTITION
      columns, so each output directory is produced by few tasks — the
      layout that avoids (n_tasks × n_partitions) small files;
    - ``sort_within`` orders rows inside each task before write
      (`sortWithinPartitions` — a local sort, never a global exchange),
      which tightens parquet min/max column indexes for downstream
      predicate-pushdown scans;
    - ``maxRecordsPerFile`` bounds the damage if the size estimate is
      low (a task holding 10× the target splits its output file).
    """
    n, est = plan_shards(df, target_file_mb=target_file_mb)
    out = df
    if partition_by:
        out = out.repartition(n, *[out[c] for c in partition_by])
    else:
        out = out.repartition(n)
    if sort_within:
        out = out.sortWithinPartitions(*sort_within)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return {
        "path": path,
        "n_shards": n,
        "est_bytes": est,
        "partition_by": list(partition_by),
    }


def shuffle_shards(
    df: DataFrame,
    *,
    id_cols: Sequence[str],
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle for training-data serving: every row
    gets a ``(shard, pos)`` address that is a seeded pseudorandom
    permutation of the corpus — the "global shuffle before training"
    step, reproducible across runs and engines.

    Design for 100 TB:
    - the shuffle key is an md5-derived 60-bit integer of
      ``(id_cols..., seed)`` — the repo's cross-engine hash (identical
      bit pattern in Spark and DuckDB, see llmdata/dedup.py), so shard
      assignment is a pure narrow expression, reproducible anywhere;
    - ``pos`` is a row_number window PER SHARD (partitionBy shard,
      order by hash) — ~corpus/n_shards rows per window partition,
      never a single global sort; a training reader streams shard
      files and trusts ``pos`` for intra-shard order;
    - ties: the hash orders by (hash, id_cols...) so exact hash
      collisions stay deterministic.

    Changing ``seed`` re-permutes every epoch; `write_dataset(...,
    partition_by=[shard_col], sort_within=[pos_col])` materializes the
    shuffled dataset with one partition-aligned exchange.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not id_cols:
        raise ValueError("shuffle_shards: id_cols must be non-empty")
    if n_shards < 1:
        raise ValueError("shuffle_shards: n_shards must be >= 1")
    # 60-bit md5 prefix: always non-negative, so Spark pmod and DuckDB %
    # agree on the shard id
    h = F.expr(
        f"cast(conv(substr(md5(concat_ws('|', "
        f"{', '.join(f'cast({c} as string)' for c in id_cols)}, "
        f"'{int(seed)}')), 1, 15), 16, 10) as bigint)"
    )
    out = df.withColumn("__h", h).withColumn(
        shard_col, F.pmod(F.col("__h"), F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(
        F.col("__h").asc(), *[F.col(c).asc() for c in id_cols]
    )
    return out.withColumn(
        pos_col, (F.row_number().over(w) - 1).cast("long")
    ).drop("__h")


def oracle_shuffle_shards_sql(
    table: str,
    *,
    id_cols: Sequence[str],
    n_shards: int,
    seed: int = 0,
    select_cols: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`shuffle_shards` (same md5-derived hash)."""
    ids = ", ".join(f"cast({c} as varchar)" for c in id_cols)
    keep = ", ".join(select_cols) if select_cols else ", ".join(id_cols)
    order_ids = ", ".join(id_cols)
    return f"""
WITH h AS (
  SELECT {keep},
    CAST('0x' || substr(md5(concat_ws('|', {ids}, '{int(seed)}')), 1, 15)
         AS BIGINT) AS __h
  FROM {table}
)
SELECT {keep},
  CAST(__h % {int(n_shards)} AS INT) AS shard,
  CAST(row_number() OVER (
    PARTITION BY __h % {int(n_shards)} ORDER BY __h, {order_ids}
  ) - 1 AS BIGINT) AS pos
FROM h
"""
