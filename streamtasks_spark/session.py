"""SparkSession factory.

Single place where scale-relevant knobs live. Local mode is for tests; the
same settings (AQE, adaptive skew-join handling, Arrow) are what we'd want
on a 1000-executor cluster — only memory/parallelism sizing is local-only.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import SparkSession


# InferFiltersFromGenerate rewrites explode(arr) into
# filter(size(arr)>0 AND isnotnull(arr)) + explode(arr). When arr is a
# COMPUTED array (every explode in this engine: shingle hashes, LSH
# bands, chunk slices), the filter inlines the full expression and
# predicate pushdown then drags it below the spread() repartition —
# so the most expensive projection in the plan runs twice, one of the
# runs single-threaded in the scan stage. The rule only ever pays off
# when the generator input is a STORED column that pruning can reach;
# we have none, so exclude it. Measured on the 8-gram decontaminate
# scan at sf0.1: 4.0 s -> 0.31 s (13x).
_EXCLUDED_OPT_RULES = ",".join([
    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
])


def exclude_generate_filter_inference(spark: SparkSession) -> None:
    """Runtime-settable twin of the builder config, for sessions built
    by someone else (the round driver passes its own SparkSession).
    Merges with any exclusions already configured."""
    try:
        cur = spark.conf.get("spark.sql.optimizer.excludedRules")
    except Exception:
        cur = None
    if not cur:
        spark.conf.set("spark.sql.optimizer.excludedRules", _EXCLUDED_OPT_RULES)
    elif _EXCLUDED_OPT_RULES not in cur:
        spark.conf.set(
            "spark.sql.optimizer.excludedRules", f"{cur},{_EXCLUDED_OPT_RULES}"
        )


def get_spark(
    app_name: str = "streamtasks_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session.

    Tuned for correctness-at-scale defaults:
      - AQE on (runtime coalesce, skew-join splitting, dynamic join strategy)
      - UTC session timezone (parity with the DuckDB oracle)
      - Arrow on for every pandas UDF hop
      - shuffle partitions sized to the local core count; on a real cluster
        AQE coalesces, so a high initial number is safe.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # many distinct queries per session (bench/oracle runs): keep their
        # compiled whole-stage-codegen classes cached instead of re-Janino-ing
        .config("spark.sql.codegen.cache.maxEntries", "1000")
        # Root LIMITs here are almost all bounded gate probes
        # (bounded_collect, the ANN/BPE local-train pulls, the CC
        # fast-path pull) that usually DRAIN an under-bound frame, so
        # CollectLimit's default 1→4→16→... partition scale-up costs
        # ~4 driver round-trips per pull. Factor 32 keeps the cheap
        # 1-partition first probe (the over-bound early-exit at
        # cluster scale) and then covers a local-mode frame in ONE
        # second round. Same-session A/B at sf0.1 (best-of-3): the
        # five training-pull-heaviest queries 17.97 s → 11.97 s
        # (text_semantic_dedup 7.10 → 3.17). Setting
        # initialNumPartitions=cores instead was measured WORSE (32
        # task launches for every probe, even the selective ones).
        .config("spark.sql.limit.scaleUpFactor", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # timestamps in testdata are timezone-less; read them as-is
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        # testdata stores TIMESTAMP(NANOS) parquet, which Spark has no
        # native type for — read as long and convert (read_parquet below)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.optimizer.excludedRules", _EXCLUDED_OPT_RULES)
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Process-level parquet METADATA memo (r11 optimization, guide §6):
# schema inference for an unknown parquet path costs one Spark job per
# read (footer fetch) plus a driver-side pyarrow footer read — pure
# fixed overhead repeated by every query that opens the same file.
# Keyed on (realpath, mtime_ns, size) so any rewrite of the data
# invalidates the entry; holds only StructType + column names (never
# rows), so it is catalog-class metadata — the same thing a metastore
# caches — not result caching: every query still computes entirely
# from the parquet bytes. Survives the bench's periodic session
# restarts (StructType is session-independent), which is where the
# win compounds: ~1 job × 10 tables × every relational query.
_PARQUET_META_MEMO: dict = {}


def read_parquet(spark: SparkSession, path: str):
    """Read parquet, transparently converting TIMESTAMP(NANOS) columns
    (which Spark lacks a native type for) to TIMESTAMP via micros.
    The testdata's nanos columns carry only microsecond precision, so the
    conversion is lossless. Works regardless of who built the session:
    the legacy conf is runtime-settable."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    exclude_generate_filter_inference(spark)
    memo_key = None
    try:
        st = os.stat(path)
        if os.path.isfile(path):
            memo_key = (os.path.realpath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        pass
    # Per-SESSION DataFrame memo: a DataFrame is an unexecuted plan —
    # reusing it caches no rows (every action still scans the parquet),
    # it only skips the ~180 ms driver-side DataSource re-resolution a
    # repeated open pays. Attached to the live SparkSession object so a
    # session restart (bench does one every 5 queries) starts clean.
    df_memo = getattr(spark, "_stsp_df_memo", None)
    if df_memo is None:
        df_memo = {}
        spark._stsp_df_memo = df_memo
    if memo_key is not None and memo_key in df_memo:
        return df_memo[memo_key]
    cached = _PARQUET_META_MEMO.get(memo_key) if memo_key else None
    if cached is not None:
        spark_schema, nanos_cols = cached
        df = spark.read.schema(spark_schema).parquet(path)
    else:
        df = spark.read.parquet(path)
        try:
            import pyarrow.parquet as pq

            schema = pq.read_schema(path)
            nanos_cols = [
                f.name for f in schema if str(f.type) == "timestamp[ns]"
            ]
        except Exception:
            nanos_cols = []
        if memo_key:
            _PARQUET_META_MEMO[memo_key] = (df.schema, nanos_cols)
    for c in nanos_cols:
        # integer division: epoch-nanos (~1.7e18) exceeds double precision
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if memo_key is not None:
        df_memo[memo_key] = df
    return df


def named_output(df, name: str) -> None:
    """NamedOutput (reference system/tasks/namedoutput.py:20-37 via
    NamedTopicManager): publish a stream/table under a global name.
    Global temp views outlive the creating SparkSession within the
    application — the engine's name registry."""
    df.createOrReplaceGlobalTempView(name)


def named_input(spark: SparkSession, name: str):
    """NamedInput (reference namedinput.py:19-35): resolve a global name
    to its stream/table."""
    return spark.table(f"global_temp.{name}")


def list_named_topics(spark: SparkSession) -> list[str]:
    """Registry listing (reference NamedTopicManager resolve surface)."""
    return [t.name for t in spark.catalog.listTables("global_temp")]


class LazyTables(Mapping):
    """Mapping of table name → DataFrame that opens each table on FIRST
    access (r11 optimization): opening a parquet table costs a Spark
    job + driver round-trips, and the eager form charged every
    relational query for all 10 tables when most touch 1-4 — measured
    2.6 s / 10 jobs per query at sf0.1. Lazy loading is also the right
    100 TB shape: never touch storage for tables a query doesn't read.
    Semantics preserved: a missing file raises KeyError on access, the
    temp view registers when (and only when) the table is opened, and
    repeated access returns the same DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str, names):
        self._spark = spark
        self._sf_dir = sf_dir
        self._names = [
            n for n in names
            if os.path.exists(os.path.join(sf_dir, f"{n}.parquet"))
        ]
        self._loaded: dict = {}

    def __getitem__(self, name: str):
        if name not in self._names:
            raise KeyError(name)
        df = self._loaded.get(name)
        if df is None:
            path = os.path.join(self._sf_dir, f"{name}.parquet")
            df = read_parquet(self._spark, path)
            # registering the same plan under the same name is a no-op;
            # skip the ~30 ms py4j round-trip when this session already
            # holds this exact view (keyed on the df plan object)
            views = getattr(self._spark, "_stsp_views", None)
            if views is None:
                views = {}
                self._spark._stsp_views = views
            if views.get(name) is not df:
                df.createOrReplaceTempView(name)
                views[name] = df
            self._loaded[name] = df
        return df

    def __iter__(self):
        return iter(self._names)

    def __len__(self):
        return len(self._names)


def load_tables(spark: SparkSession, sf_dir: str) -> "LazyTables":
    """Driver tables of a scale-factor dir as a lazy name → DataFrame
    mapping; each table opens (and registers its temp view) on first
    access — see :class:`LazyTables`."""
    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return LazyTables(spark, sf_dir, names)
