"""Scale utilities: co-located bucketed joins and salted skew joins.

Two shuffle disciplines the 100 TB plan needs beyond what AQE gives for
free (session.py enables AQE skew-join splitting, which handles
partition-level skew at runtime):

- :func:`write_bucketed` / :func:`bucketed` — persist a table bucketed
  (and sorted) by its join key so that repeated fact⋈fact joins on that
  key run WITHOUT a shuffle on either side: Spark's bucketing reader
  exposes the bucket hash-partitioning to the planner, and a sort-merge
  join of two tables co-bucketed on the join key needs no Exchange. At
  100 TB this converts the biggest cost of every orders⋈lineitem-shaped
  query from a per-query shuffle into a once-at-ingest layout decision.
  (tests/test_plans.py pins the zero-Exchange property.)
- :func:`salted_join` — explicit key salting for joins whose hot keys
  a static planner cannot split: the big side gets a deterministic salt
  in ``[0, n)`` derived from a caller-named distinct column, the small
  side is replicated n× (explode of a literal sequence), and the join
  key becomes (key, salt) — a hot key's rows now land on n partitions
  instead of one. Use when one key holds >> 1/parallelism of the rows
  and the small side is too big to broadcast whole but fine to
  replicate n×. Deterministic (content-derived salt, no rand()), so
  results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    name: str,
    *,
    buckets: int,
    key: str | Sequence[str],
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table registered as
    ``name``. ``path`` makes it an external table (tests use a tmp dir);
    omitted, it lands in the session warehouse. Bucket count is a layout
    contract: joins co-locate only between tables with the SAME count."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(buckets, *keys).sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)


def bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a
    plain ``spark.read.parquet`` on the files would lose it)."""
    return spark.table(name)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    salt_src: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the big side's hot keys spread
    over ``n_salt`` shuffle partitions.

    ``salt_src`` names a big-side column whose values vary WITHIN a join
    key (a row id, sequence number, timestamp); the salt is
    ``pmod(xxhash64(salt_src), n_salt)``, so the same row always gets
    the same salt (deterministic), while a hot key's rows fan out
    across salts. The small side is exploded n_salt× — its dup factor
    is the price of not broadcasting; keep n_salt ≈ the skew factor,
    not the cluster size. Output columns = the plain join's (salt
    dropped)."""
    keys = [on] if isinstance(on, str) else list(on)
    if how.replace("_", "").lower() in {"right", "rightouter", "full", "fullouter", "outer"}:
        # an unmatched small-side row would surface once PER REPLICA
        raise ValueError(
            f"salted_join does not support how={how!r}: the small side is "
            f"replicated {n_salt}x, so outer-preserving it duplicates "
            "unmatched rows. Salt the other side instead."
        )
    b = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt))
    )
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<long>")),
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")
