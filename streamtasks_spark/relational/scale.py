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

from pyspark.sql import DataFrame, SparkSession, Window
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


# --------------------------------------------------------- z-order layout

# Morton (z-order) interleave: dimension d contributes its i-th bit at
# output position i·ndims + d. One loop renders the expression for both
# engines (Spark spells shifts as functions, DuckDB as operators), so
# the engine and the oracle cannot disagree on the curve.


def _z_interleave(qcols: Sequence[str], bits: int, engine: str) -> str:
    nd = len(qcols)
    terms = []
    for d, q in enumerate(qcols):
        for i in range(bits):
            j = i * nd + d
            if engine == "spark":
                terms.append(f"shiftleft(shiftright({q}, {i}) & 1, {j})")
            else:
                terms.append(f"((({q} >> {i}) & 1) << {j})")
    return " + ".join(terms)


def _z_quantize(col: str, kind: str, bits: int, engine: str) -> str:
    """Min-max linear quantization of ``col`` onto [0, 2^bits): integer
    dims in exact integer arithmetic (bound: range·2^bits < 2^63 —
    fine for any realistic id/timestamp domain), double dims in IEEE
    arithmetic with an identical expression tree on both engines.
    A constant dimension (max = min) quantizes to 0 via the nullif
    guard; NULL values land at the origin (deterministic, and a z-range
    scan must treat NULL-at-origin as always-overlapping anyway)."""
    m = (1 << bits) - 1
    lo, hi = f"min_{col}", f"max_{col}"
    if kind == "int":
        idiv = "div" if engine == "spark" else "//"
        q = f"(({col} - {lo}) * {m}) {idiv} nullif({hi} - {lo}, 0)"
    else:
        q = (
            f"CAST(floor((({col} - {lo}) * {m}) / "
            f"nullif({hi} - {lo}, CAST(0.0 AS DOUBLE))) AS BIGINT)"
        )
    # coalesce INSIDE the least: both engines' least() SKIPS nulls, so
    # least(m, NULL) would be m — a NULL value or constant dim must land
    # at the origin, not the top bin (caught by the python-model test).
    return f"least(CAST({m} AS BIGINT), coalesce({q}, 0))"


def zorder_key(
    df: DataFrame, dims: Sequence[tuple[str, str]], *, bits: int = 10
) -> DataFrame:
    """Append a Morton z-order key over ``dims`` (list of
    ``(column, kind)`` with kind ``"int"`` or ``"double"``) as ``zkey``.

    The layout discipline bucketing and salting don't cover: multi-
    dimensional file skipping. Sorting 100 TB by ONE column makes that
    column's per-file min/max ranges tight and every other column's
    ranges full-width; sorting by the z-curve keeps EVERY interleaved
    dimension's per-file range narrow, so a scan filtering on any
    subset of the dims prunes files on ordinary parquet min/max stats
    (the Delta/Iceberg OPTIMIZE ZORDER story, built from plain Spark).

    Plan shape: one single-row min/max profile agg broadcast back onto
    the scan, then the key is a pure per-row bit expression — narrow,
    codegen'd, no shuffle beyond the layout write itself
    (:func:`zorder_layout`)."""
    prof = df.agg(
        *[
            f
            for col, _ in dims
            for f in (
                F.min(col).alias(f"min_{col}"),
                F.max(col).alias(f"max_{col}"),
            )
        ]
    )
    qs = [
        _z_quantize(col, kind, bits, "spark") for col, kind in dims
    ]
    out = df.crossJoin(F.broadcast(prof))
    for (col, _), q in zip(dims, qs):
        out = out.withColumn(f"__q_{col}", F.expr(q))
    zexpr = _z_interleave([f"__q_{c}" for c, _ in dims], bits, "spark")
    return out.withColumn("zkey", F.expr(zexpr)).drop(
        *[f"__q_{c}" for c, _ in dims],
        *[f"min_{c}" for c, _ in dims],
        *[f"max_{c}" for c, _ in dims],
    )


def zorder_layout(
    df: DataFrame,
    dims: Sequence[tuple[str, str]],
    *,
    bits: int = 10,
    n_files: int = 8,
    curve: str = "z",
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition on the curve key
    into ``n_files`` contiguous segments and sort within each — every
    output file covers a compact key range, hence a small box in every
    interleaved dimension. ``curve="hilbert"`` (2 dims only) uses the
    jump-free :func:`hilbert_key` walk for tighter boxes. Write the
    result with plain ``.write.parquet``; the pruning then comes for
    free from parquet min/max stats. (The key column rides along so
    stats land in the footer; drop it before write if schema parity
    matters.)"""
    if curve == "hilbert":
        keyed, key = hilbert_key(df, dims, bits=bits), "hkey"
    elif curve == "z":
        keyed, key = zorder_key(df, dims, bits=bits), "zkey"
    else:
        raise ValueError(f"unknown curve {curve!r}: use 'z' or 'hilbert'")
    return keyed.repartitionByRange(n_files, key).sortWithinPartitions(key)


def _hilbert_level(s: int, n: int, engine: str) -> tuple[str, str, str]:
    """One unrolled level of the classic xy→d Hilbert walk (Wikipedia's
    ``xy2d``/``rot``): expressions for the d increment and the rotated
    (x, y) in terms of the previous level's ``__hx``/``__hy``. The only
    engine split is XOR — Spark spells it ``^``, DuckDB's ``^`` is
    POWER and its XOR is ``xor()``."""
    rx = f"(CASE WHEN (__hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (__hy & {s}) > 0 THEN 1 ELSE 0 END)"
    mix = (
        f"((3 * {rx}) ^ {ry})" if engine == "spark"
        else f"xor(3 * {rx}, {ry})"
    )
    d_inc = f"CAST({s} AS BIGINT) * {s} * {mix}"
    # rot: if ry==0 { if rx==1 { x,y = n-1-x, n-1-y }; swap(x,y) }
    x_new = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - __hy ELSE __hy END) "
        f"ELSE __hx END"
    )
    y_new = (
        f"CASE WHEN {ry} = 0 THEN "
        f"(CASE WHEN {rx} = 1 THEN {n - 1} - __hx ELSE __hx END) "
        f"ELSE __hy END"
    )
    return d_inc, x_new, y_new


def hilbert_key(
    df: DataFrame, dims: Sequence[tuple[str, str]], *, bits: int = 10
) -> DataFrame:
    """Append a Hilbert-curve key over exactly TWO dims (same
    ``(column, kind)`` spec and min-max quantization as
    :func:`zorder_key`) as ``hkey``.

    Why a second curve: the z-curve takes long diagonal jumps at bit
    boundaries (…011→100… flips every low bit), so a contiguous z-range
    can cover two far-apart boxes; the Hilbert walk moves ONE grid step
    per key increment (adjacency is pinned by test), so contiguous key
    ranges are compact regions and per-file min/max boxes come out
    tighter — the reason layout clustering in modern lakehouse engines
    graduated from z-order to Hilbert. Cost: the key is ``bits``
    unrolled rotate/flip levels instead of one interleave — still a
    pure per-row codegen'd integer expression, no shuffle, no UDF.
    Write path: ``zorder_layout(..., curve="hilbert")``."""
    if len(dims) != 2:
        raise ValueError(
            f"hilbert_key supports exactly 2 dims (got {len(dims)}): the "
            "rotate/flip recurrence is dimension-specific; for more dims "
            "use zorder_key"
        )
    prof = df.agg(
        *[
            f
            for col, _ in dims
            for f in (
                F.min(col).alias(f"min_{col}"),
                F.max(col).alias(f"max_{col}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(prof))
    for (col, kind), name in zip(dims, ("__hx", "__hy")):
        out = out.withColumn(name, F.expr(_z_quantize(col, kind, bits, "spark")))
    out = out.withColumn("hkey", F.lit(0).cast("bigint"))
    n = 1 << bits
    for lvl in range(bits - 1, -1, -1):
        d_inc, x_new, y_new = _hilbert_level(1 << lvl, n, "spark")
        out = out.withColumns(
            {
                "hkey": F.col("hkey") + F.expr(d_inc),
                "__hx": F.expr(x_new),
                "__hy": F.expr(y_new),
            }
        )
    return out.drop(
        "__hx", "__hy",
        *[f"min_{c}" for c, _ in dims],
        *[f"max_{c}" for c, _ in dims],
    )


def oracle_hilbert_key_sql(
    source_sql: str,
    dims: Sequence[tuple[str, str]],
    *,
    bits: int = 10,
    keep: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`hilbert_key`: same quantization fragments,
    same unrolled levels as chained CTEs."""
    prof_cols = ", ".join(
        f"min({col}) AS min_{col}, max({col}) AS max_{col}"
        for col, _ in dims
    )
    keep_sql = (", ".join(keep) + ", ") if keep else ""
    q0 = ", ".join(
        f"{_z_quantize(col, kind, bits, 'duck')} AS {name}"
        for (col, kind), name in zip(dims, ("__hx", "__hy"))
    )
    n = 1 << bits
    levels = []
    prev = "h0"
    for i, lvl in enumerate(range(bits - 1, -1, -1)):
        d_inc, x_new, y_new = _hilbert_level(1 << lvl, n, "duck")
        levels.append(
            f"h{i + 1} AS (SELECT {keep_sql}hkey + {d_inc} AS hkey, "
            f"{x_new} AS __hx, {y_new} AS __hy FROM {prev})"
        )
        prev = f"h{i + 1}"
    chain = ",\n    ".join(levels)
    return f"""
    WITH src AS ({source_sql}),
    prof AS (SELECT {prof_cols} FROM src),
    h0 AS (SELECT {keep_sql}CAST(0 AS BIGINT) AS hkey, {q0}
           FROM src, prof),
    {chain}
    SELECT {keep_sql}hkey FROM {prev}
    """


def oracle_zorder_key_sql(
    source_sql: str,
    dims: Sequence[tuple[str, str]],
    *,
    bits: int = 10,
    keep: Sequence[str] = (),
) -> str:
    """DuckDB twin of :func:`zorder_key`: same profile CTE, same
    quantization fragments, same interleave loop."""
    prof_cols = ", ".join(
        f"min({col}) AS min_{col}, max({col}) AS max_{col}"
        for col, _ in dims
    )
    qsel = ", ".join(
        f"{_z_quantize(col, kind, bits, 'duck')} AS __q_{col}"
        for col, kind in dims
    )
    zexpr = _z_interleave([f"__q_{c}" for c, _ in dims], bits, "duck")
    keep_sql = (", ".join(keep) + ", ") if keep else ""
    return f"""
    WITH src AS ({source_sql}),
    prof AS (SELECT {prof_cols} FROM src),
    q AS (SELECT {keep_sql}{qsel} FROM src, prof)
    SELECT {keep_sql}{zexpr} AS zkey FROM q
    """


# ------------------------------------------------------- skew profiling

# Percentiles of the per-key count distribution, as exact integer
# selection: the p-th value is the (floor(p·(n_keys−1)) + 1)-th smallest
# count. num/den rationals keep the threshold in INTEGER arithmetic on
# both engines — a 0.99 literal is DOUBLE in Spark but DECIMAL(3,2) in
# DuckDB, and floor(0.99·300) differs between those types (296 vs 297),
# a divergence integer div never has. One shared table so the engine and
# the oracle cannot disagree on which percentiles the report carries.
SKEW_PCTS = (("p50_cnt", 1, 2), ("p90_cnt", 9, 10), ("p99_cnt", 99, 100))


def _pct_exprs(engine: str) -> list[str]:
    idiv = "div" if engine == "spark" else "//"
    return [
        f"min(CASE WHEN cum >= (({num} * (n_keys - 1)) {idiv} {den}) + 1 "
        f"THEN cnt END) AS {name}"
        for name, num, den in SKEW_PCTS
    ]


def key_skew_report(df: DataFrame, key: str, *, top_k: int = 5) -> DataFrame:
    """Skew profile of ``df``'s ``key`` distribution — the measurement
    that decides between a plain shuffle join, :func:`salted_join` (and
    its ``n_salt``), or a broadcast. Returns the ``top_k`` heaviest keys
    (count desc, key asc), each row carrying the corpus-level
    distribution columns::

        (key, cnt, share_ppm, total_rows, n_keys, max_cnt,
         p50_cnt, p90_cnt, p99_cnt, suggested_salt)

    ``share_ppm`` = floor(cnt·10⁶/total). ``suggested_salt`` =
    ceil(max_cnt / floor(total/n_keys)) — the hot key's multiple of the
    (floored) average key load, i.e. how many partitions its rows should
    fan out across; 1 means unskewed. All columns are integer-exact.

    100 TB shape — every step is reduced before it moves: per-key counts
    are ONE shuffle with map-side partial agg; the percentile selection
    runs over the count-of-counts histogram (groupBy cnt — heavy-tailed
    real data repeats count values massively, so |distinct cnt| is tiny
    even at 10⁹ keys), whose cumulative window is a single ordered
    partition of that tiny table, NOT of the keys; the top-k is a
    TakeOrdered (per-partition heaps + driver merge of k·partitions
    rows), never a global sort. The single-row profile broadcasts onto
    the k output rows. Integer bounds: cnt·10⁶ requires a single key's
    count < 9.2·10¹² — beyond pathological even at 100 TB."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    # three consumers (histogram, profile scalars, top-k heap) of one
    # shuffle output
    from streamtasks_spark.llmdata.dedup import pin

    counts = pin(counts)
    hist = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("freq"))
    cum = hist.withColumn("cum", F.sum("freq").over(Window.orderBy("cnt")))
    prof_base = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    prof = (
        cum.crossJoin(F.broadcast(prof_base))
        .groupBy("total_rows", "n_keys", "max_cnt")
        .agg(*[F.expr(e) for e in _pct_exprs("spark")])
    )
    # asc_nulls_last pins the tie-break to DuckDB's ASC default (NULLS
    # LAST) — Spark's bare asc() is NULLS FIRST, a latent divergence
    # when a NULL key ties on count exactly at the top_k boundary
    heavy = counts.orderBy(
        F.col("cnt").desc(), F.col(key).asc_nulls_last()
    ).limit(top_k)
    return heavy.crossJoin(F.broadcast(prof)).select(
        F.col(key),
        F.col("cnt"),
        F.expr("(cnt * 1000000) div total_rows").alias("share_ppm"),
        F.col("total_rows"),
        F.col("n_keys"),
        F.col("max_cnt"),
        *[F.col(name) for name, _, _ in SKEW_PCTS],
        F.expr(
            "(max_cnt + (total_rows div n_keys) - 1) div "
            "(total_rows div n_keys)"
        ).alias("suggested_salt"),
    )


def oracle_key_skew_report_sql(
    source_sql: str, *, key: str, top_k: int = 5
) -> str:
    """DuckDB twin of :func:`key_skew_report` — same count-histogram
    percentile selection and integer arithmetic, rendered from the same
    :data:`SKEW_PCTS` table."""
    pcts = ",\n           ".join(_pct_exprs("duck"))
    return f"""
    WITH src AS ({source_sql}),
    counts AS (SELECT {key}, count(*) AS cnt FROM src GROUP BY 1),
    hist AS (SELECT cnt, count(*) AS freq FROM counts GROUP BY 1),
    cum_t AS (SELECT cnt, sum(freq) OVER (ORDER BY cnt) AS cum FROM hist),
    prof_base AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
             count(*) AS n_keys, max(cnt) AS max_cnt
      FROM counts
    ),
    prof AS (
      SELECT p.total_rows, p.n_keys, p.max_cnt,
           {pcts}
      FROM cum_t, prof_base p
      GROUP BY 1, 2, 3
    ),
    heavy AS (
      SELECT {key}, cnt FROM counts
      ORDER BY cnt DESC, {key} ASC LIMIT {top_k}
    )
    SELECT h.{key}, h.cnt,
           (h.cnt * 1000000) // p.total_rows AS share_ppm,
           p.total_rows, p.n_keys, p.max_cnt,
           {", ".join("p." + name for name, _, _ in SKEW_PCTS)},
           (p.max_cnt + (p.total_rows // p.n_keys) - 1)
             // (p.total_rows // p.n_keys) AS suggested_salt
    FROM heavy h, prof p
    """
