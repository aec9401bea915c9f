"""Corpus-assembly operators for LLM training-data pipelines.

Three operators a 100 TB pretraining pipeline runs after dedup/quality
filtering, over a ``documents``-style table (id + text + strata cols):

- :func:`decontaminate` — benchmark decontamination: flag corpus
  documents sharing word n-grams with an evaluation set (the GPT-3 /
  PaLM contamination rule; 8-grams by default). The eval side of the
  join is tiny (benchmarks are ~10^4-10^6 n-grams) and is broadcast,
  so the corpus side streams through a map-side hash join with no
  shuffle of the exploded n-grams; the only shuffle is the per-doc
  count aggregation (map-side partial agg on doc id).
- :func:`stratified_sample` — deterministic k-per-stratum sample:
  rank documents inside each stratum by a salted md5 hash and keep the
  first k. One shuffle on the strata columns; rank is a window, not a
  global sort. Deterministic = reproducible across runs/engines —
  sampling for eval or annotation must not drift between pipeline runs.
- :func:`split_assign` — hash-bucketed train/valid/test assignment:
  bucket = salted md5 of the id mod 1000, split boundaries from the
  requested weights. Pure narrow projection — no shuffle at all, and a
  document keeps its split forever regardless of corpus growth (the
  property random sampling lacks).

Cross-engine determinism follows dedup.py: every hash derives from md5
hex prefixes (``conv(substr(md5(x),1,7),16,10)`` in Spark ≡
``cast('0x'||substr(md5(x),1,7) as bigint)`` in DuckDB), so the
``oracle_*_sql`` builders reproduce the EXACT algorithms.

Reference parity note: the reference repo (an A/V dataflow engine) has
no corpus-assembly tier; like dedup.py this is the BASELINE.json
"LLM-data pipeline" requirement, built on the same Spark-first
vocabulary.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _shingle_hashes, norm_text, spread, tokens_expr

# default split weights: the conventional 90/5/5 pretraining split
DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.90),
    ("valid", 0.05),
    ("test", 0.05),
)
SPLIT_BUCKETS = 1000


# -------------------------------------------------------- decontaminate

def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    n: int = 8,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag corpus documents overlapping the evaluation set: returns
    (id, n_shared) for every document sharing ≥ ``min_overlap`` distinct
    word ``n``-grams with ANY eval document.

    N-grams are compared via their 28-bit md5-prefix hashes (identical
    to the dedup tier's shingle hashes), so the eval-side set stays
    compact for the broadcast; a false flag needs a 28-bit collision
    AND a failed manual review — acceptable for a removal list.
    """
    eval_id_col = eval_id_col or id_col
    eval_text_col = eval_text_col or text_col
    doc_ng = _shingle_hashes(docs, id_col, text_col, n).select(
        F.col(id_col), F.explode("hashes").alias("__ng")
    )
    ev_ng = (
        _shingle_hashes(eval_docs, eval_id_col, eval_text_col, n)
        .select(F.explode("hashes").alias("__ng"))
        .distinct()
    )
    return (
        doc_ng.join(F.broadcast(ev_ng), "__ng")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(min_overlap))
    )


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str | None = None,
    eval_text_col: str | None = None,
    n: int = 8,
) -> DataFrame:
    """The EVAL-side inverse of :func:`decontaminate`: one row per
    evaluation document reporting how compromised it is by the training
    corpus — ``n_grams`` (its distinct word ``n``-grams), ``n_hit_grams``
    (how many of those appear anywhere in the corpus), ``n_corpus_docs``
    (distinct corpus documents sharing ≥1 gram), and ``contamination``
    = n_hit_grams / n_grams. This is the per-item audit an eval owner
    reads (the GPT-3 appendix-C "dirty eval" analysis as a query), where
    decontaminate is the corpus-side removal list. Eval docs shorter
    than ``n`` tokens have no n-grams and are excluded (same gate as
    the removal list — both engines filter ``len ≥ n``).

    An eval ITEM is its ``eval_id`` (r09, closing the r08 advisor
    finding): rows sharing an id merge — ``n_grams`` is the distinct
    gram count of their UNION, so contamination stays ≤ 1.0 where the
    r08 shape divided one merged hit-set by each row's own gram count;
    and a NULL id forms a single reported item, carried through a
    NULL-safe final join (``eqNullSafe`` here, ``IS NOT DISTINCT
    FROM`` in the oracle — Spark's groupBy keeps a NULL-id group that
    a plain equi-join silently zeroed to contamination 0.0 even when
    contaminated, the exact hazard class the r08 unigram_lm/dsir
    oracle fix closed).

    100 TB shape: the eval side is benchmark-sized and BROADCASTS (ids
    + 28-bit gram hashes); the corpus side streams through ONE scan,
    its exploded grams hash-joined to the broadcast and aggregated per
    eval id with partial aggregation — the decontaminate shape with
    the aggregation keyed on the small side's id. Distinct counts are
    per-eval-id; cardinality is bounded by the eval doc's own gram
    count and the corpus-doc fan-in, never the corpus gram stream."""
    eval_id_col = eval_id_col or id_col
    eval_text_col = eval_text_col or text_col
    # distinct (id, gram) pairs = the union of a duplicated id's grams;
    # the eval side is benchmark-sized, so the extra distinct is cheap
    # and the broadcast stays compact
    ev_ng = (
        _shingle_hashes(eval_docs, eval_id_col, eval_text_col, n)
        .select(
            F.col(eval_id_col).alias("eval_id"),
            F.explode("hashes").alias("__ng"),
        )
        .distinct()
    )
    ev_stats = ev_ng.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    corpus_ng = _shingle_hashes(docs, id_col, text_col, n).select(
        F.col(id_col).alias("__cid"), F.explode("hashes").alias("__ng")
    )
    hits = (
        corpus_ng.join(F.broadcast(ev_ng), "__ng")
        .groupBy("eval_id")
        .agg(
            F.countDistinct("__ng").alias("__hit"),
            F.countDistinct("__cid").alias("__docs"),
        )
        .withColumnRenamed("eval_id", "__eid")
    )
    # hits is eval-benchmark-sized (one row per contaminated eval id) —
    # broadcast it so the bounded-key final join never sorts/shuffles
    # (the initial plan otherwise sort-merge-joins two tiny sides)
    return ev_stats.join(
        F.broadcast(hits), F.col("eval_id").eqNullSafe(F.col("__eid")), "left"
    ).select(
        F.col("eval_id"),
        "n_grams",
        F.coalesce(F.col("__hit"), F.lit(0)).alias("n_hit_grams"),
        F.coalesce(F.col("__docs"), F.lit(0)).alias("n_corpus_docs"),
        F.round(
            F.coalesce(F.col("__hit"), F.lit(0)).cast("double")
            / F.col("n_grams").cast("double"),
            6,
        ).alias("contamination"),
    )


def oracle_contamination_report_sql(
    source_sql: str = "SELECT doc_id, text FROM documents",
    eval_sql: str = "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 7",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> str:
    """DuckDB twin of :func:`contamination_report` — identical gram
    hashes, identical len ≥ n gate, identical distinct counts,
    identical id-keyed merge of duplicated eval ids, and the same
    NULL-safe final join (``IS NOT DISTINCT FROM`` ↔ ``eqNullSafe``)."""
    gram = " || ' ' || ".join(f"__toks[i + {d}]" for d in range(n))
    ngrams = f"""
      SELECT {id_col},
             list_distinct(list_transform(
               list_transform(range(1, len(__toks) - {n - 1} + 1), i -> {gram}),
               s -> cast('0x' || substr(md5(s), 1, 7) AS BIGINT))) AS hashes
      FROM (SELECT {id_col},
                   string_split({norm_text(text_col, "duck")}, ' ') AS __toks
            FROM __SRC__)
      WHERE len(__toks) >= {n}
    """
    return f"""
    WITH corpus AS ({source_sql}),
    evalset AS ({eval_sql}),
    ev AS ({ngrams.replace("__SRC__", "evalset")}),
    doc_ng AS (
      SELECT {id_col} AS __cid, u.g AS __ng
      FROM ({ngrams.replace("__SRC__", "corpus")}) t, unnest(hashes) AS u(g)
    ),
    ev_ng AS (
      SELECT DISTINCT {id_col} AS eval_id, u.g AS __ng
      FROM ev, unnest(hashes) AS u(g)
    ),
    evs AS (
      SELECT eval_id, CAST(count(*) AS BIGINT) AS n_grams
      FROM ev_ng GROUP BY eval_id
    ),
    hits AS (
      SELECT e.eval_id,
        CAST(count(DISTINCT e.__ng) AS BIGINT) AS n_hit_grams,
        CAST(count(DISTINCT d.__cid) AS BIGINT) AS n_corpus_docs
      FROM ev_ng e JOIN doc_ng d ON e.__ng = d.__ng
      GROUP BY e.eval_id
    )
    SELECT evs.eval_id,
      evs.n_grams,
      coalesce(h.n_hit_grams, 0) AS n_hit_grams,
      coalesce(h.n_corpus_docs, 0) AS n_corpus_docs,
      round(CAST(coalesce(h.n_hit_grams, 0) AS DOUBLE)
            / CAST(evs.n_grams AS DOUBLE), 6) AS contamination
    FROM evs LEFT JOIN hits h ON evs.eval_id IS NOT DISTINCT FROM h.eval_id
    """


def oracle_decontaminate_sql(
    source_sql: str = "SELECT doc_id, text FROM documents",
    eval_sql: str = "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 7",
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_overlap: int = 1,
) -> str:
    gram = " || ' ' || ".join(f"__toks[i + {d}]" for d in range(n))
    ngrams = f"""
      SELECT {id_col},
             list_distinct(list_transform(
               list_transform(range(1, len(__toks) - {n - 1} + 1), i -> {gram}),
               s -> cast('0x' || substr(md5(s), 1, 7) AS BIGINT))) AS hashes
      FROM (SELECT {id_col},
                   string_split({norm_text(text_col, "duck")}, ' ') AS __toks
            FROM __SRC__)
      WHERE len(__toks) >= {n}
    """
    return f"""
    WITH corpus AS ({source_sql}),
    evalset AS ({eval_sql}),
    doc_ng AS (
      SELECT {id_col}, unnest(hashes) AS __ng
      FROM ({ngrams.replace("__SRC__", "corpus")})
    ),
    ev_ng AS (
      SELECT DISTINCT unnest(hashes) AS __ng
      FROM ({ngrams.replace("__SRC__", "evalset")})
    )
    SELECT d.{id_col}, count(*) AS n_shared
    FROM doc_ng d JOIN ev_ng e ON d.__ng = e.__ng
    GROUP BY d.{id_col}
    HAVING count(*) >= {min_overlap}
    """


# ---------------------------------------------------- stratified_sample

def stratified_sample(
    docs: DataFrame,
    *,
    strata: Sequence[str] = ("source",),
    k: int = 5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-stratum sample: (id, *strata, sample_rank)
    for the ``k`` documents ranking first in each stratum under a
    salted md5 hash of the id. The hash makes the choice uniform but
    reproducible; the id tie-break makes it total."""
    h = (
        f"conv(substring(md5(concat('smp-', cast({id_col} as string))), 1, 7), "
        "16, 10)"
    )
    w = Window.partitionBy(*strata).orderBy(
        F.expr(f"cast({h} as bigint)"), F.col(id_col)
    )
    return (
        spread(docs, *strata)
        .select(F.col(id_col), *[F.col(c) for c in strata])
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= F.lit(k))
    )


def oracle_stratified_sample_sql(
    source_sql: str = "SELECT doc_id, source FROM documents",
    strata: Sequence[str] = ("source",),
    k: int = 5,
    id_col: str = "doc_id",
) -> str:
    cols = ", ".join(strata)
    h = f"cast('0x' || substr(md5('smp-' || cast({id_col} AS varchar)), 1, 7) AS BIGINT)"
    return f"""
    WITH src AS ({source_sql}),
    ranked AS (
      SELECT {id_col}, {cols},
             row_number() OVER (PARTITION BY {cols}
                                ORDER BY {h}, {id_col}) AS sample_rank
      FROM src
    )
    SELECT {id_col}, {cols}, sample_rank FROM ranked WHERE sample_rank <= {k}
    """


# ------------------------------------------------------ pack_sequences

def pack_sequences(
    docs: DataFrame,
    *,
    seq_len: int = 2048,
    shard_cols: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining
    layout): documents are laid end-to-end in deterministic id order and
    cut into fixed ``seq_len``-token training sequences; a document may
    span a sequence boundary. Returns per document
    (id, *shard, n_tokens, start_seq, end_seq, offset) where ``offset``
    is the document's first-token position inside ``start_seq``.

    Packing is PER SHARD (default: per source): a global layout would
    be one unpartitioned window — a single-task sort at 100 TB — while
    real pipelines pack per output shard anyway. One shuffle on the
    shard key; the running total is a window cumsum, no self-join."""
    toks = f"size(split({norm_text(text_col)}, ' '))"
    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.select(
            F.col(id_col),
            *[F.col(c) for c in shard_cols],
            F.expr(toks).alias("n_tokens"),
        )
        .withColumn("__cum", F.sum("n_tokens").over(w))
        .select(
            id_col,
            *shard_cols,
            "n_tokens",
            ((F.col("__cum") - F.col("n_tokens")) / seq_len)
            .cast("bigint")
            .alias("start_seq"),
            ((F.col("__cum") - 1) / seq_len).cast("bigint").alias("end_seq"),
            ((F.col("__cum") - F.col("n_tokens")) % seq_len).alias("offset"),
        )
    )


def oracle_pack_sequences_sql(
    source_sql: str = "SELECT doc_id, source, text FROM documents",
    seq_len: int = 2048,
    shard_cols: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    shards = ", ".join(shard_cols)
    return f"""
    WITH src AS ({source_sql}),
    t AS (
      SELECT {id_col}, {shards},
             len(string_split({norm_text(text_col, "duck")}, ' ')) AS n_tokens
      FROM src
    ),
    c AS (
      SELECT {id_col}, {shards}, n_tokens,
             sum(n_tokens) OVER (PARTITION BY {shards} ORDER BY {id_col}
                                 ROWS UNBOUNDED PRECEDING) AS __cum
      FROM t
    )
    SELECT {id_col}, {shards}, n_tokens,
           CAST(floor((__cum - n_tokens) / {seq_len}) AS BIGINT) AS start_seq,
           CAST(floor((__cum - 1) / {seq_len}) AS BIGINT) AS end_seq,
           CAST((__cum - n_tokens) % {seq_len} AS BIGINT) AS offset
    FROM c
    """


# ----------------------------------------------------------- doc_chunk

def doc_chunk(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Overlapping token-window chunking — the complement of
    :func:`pack_sequences`: where packing lays documents end-to-end
    into fixed training sequences, chunking cuts each document into
    ``window``-token pieces every ``stride`` tokens (overlap =
    ``window - stride``), the layout RAG indexing and
    long-document-to-context-window preprocessing use. Output: one row
    per chunk — (id, ``chunk_id``, ``n_chunk_tokens``, ``chunk_text``)
    — covering every token; the last chunk may be shorter. Documents
    with NULL text or zero tokens produce no rows.

    100 TB shape: a single narrow stage — tokenize, compute the chunk
    count arithmetically, explode a ``sequence`` of chunk ids, and
    ``slice`` the token array per chunk. No shuffle at all (explode is
    narrow); output size is the op's own fan-out, ~``n/stride`` rows
    per document. Chunk membership depends only on the document's own
    tokens, so the op composes with any upstream filter without
    re-partitioning."""
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError(
            f"need 0 < stride <= window, got window={window} stride={stride}"
        )
    toks = tokens_expr(text_col)
    # ceil((n - window) / stride) + 1 in integer math, clamped at 1
    n_chunks = (
        f"(greatest(size(__toks) - {window}, 0) + {stride - 1}) "
        f"div {stride} + 1"
    )
    return (
        spread(docs, id_col)
        .select(F.col(id_col), F.expr(toks).alias("__toks"))
        .filter(F.expr("size(__toks) > 0"))  # NULL size is -1 in Spark
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("__c"),
        )
        .select(
            F.col(id_col),
            F.col("__c").cast("bigint").alias("chunk_id"),
            F.expr(f"slice(__toks, __c * {stride} + 1, {window})").alias("__sl"),
        )
        .select(
            F.col(id_col),
            "chunk_id",
            F.expr("cast(size(__sl) as bigint)").alias("n_chunk_tokens"),
            F.expr("array_join(__sl, ' ')").alias("chunk_text"),
        )
    )


def oracle_doc_chunk_sql(
    source_sql: str = "SELECT doc_id, text FROM documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 24,
) -> str:
    """DuckDB twin of :func:`doc_chunk` — same token filter, same
    ceil-div chunk count, same clamped slice (list_slice clamps the end
    index past the list length, matching Spark slice's length cap)."""
    return f"""
    WITH src AS ({source_sql}),
    t AS (
      SELECT {id_col},
        {tokens_expr(text_col, "duck")} AS __toks
      FROM src
    ),
    nz AS (
      SELECT {id_col}, __toks,
        (greatest(len(__toks) - {window}, 0) + {stride - 1})
          // {stride} + 1 AS __nc
      FROM t WHERE len(__toks) > 0
    )
    SELECT {id_col},
      CAST(c AS BIGINT) AS chunk_id,
      CAST(len(list_slice(__toks, c * {stride} + 1,
                          c * {stride} + {window})) AS BIGINT)
        AS n_chunk_tokens,
      array_to_string(list_slice(__toks, c * {stride} + 1,
                                 c * {stride} + {window}), ' ')
        AS chunk_text
    FROM nz, unnest(range(0, __nc)) AS u(c)
    """


# ---------------------------------------------------------- mix_sample

def _mix_quotas(
    weights: dict[str, float], budget: int
) -> list[tuple[str, int]]:
    """Largest-remainder apportionment of ``budget`` across weights:
    quotas always sum to the budget exactly (independent rounding can
    drop or add documents — round(0.5) is 0 under banker's rounding).
    Shared by the Spark operator and the oracle builder so both sides
    compute identical quotas."""
    total_w = sum(weights.values())
    raw = [(n, w / total_w * budget) for n, w in weights.items()]
    quotas = {n: int(r) for n, r in raw}
    short = budget - sum(quotas.values())
    by_remainder = sorted(raw, key=lambda nr: (-(nr[1] - int(nr[1])), nr[0]))
    for n, _ in by_remainder[:short]:
        quotas[n] += 1
    return [(n, quotas[n]) for n in weights]

def mix_sample(
    docs: DataFrame,
    weights: dict[str, float],
    *,
    budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mixture sampling: draw a deterministic sample hitting the
    target per-source composition. Each source contributes
    ``min(count_s, round(weight_s / Σweights * budget))`` documents,
    chosen as that source's first ranks under the same salted-hash
    order as :func:`stratified_sample`.

    The quotas compile to a literal CASE expression on the source
    column (mixture specs are a handful of entries), so the whole plan
    is the stratified-sample shuffle plus a narrow filter — no second
    aggregation, no join. Sources absent from ``weights`` get quota 0
    (dropped)."""
    quota = None
    for name, q in _mix_quotas(weights, budget):
        cond = F.col(source_col) == F.lit(name)
        quota = F.when(cond, F.lit(q)) if quota is None else quota.when(cond, F.lit(q))
    quota = quota.otherwise(F.lit(0))
    ranked = stratified_sample(
        docs, strata=(source_col,), k=budget, id_col=id_col
    )
    return ranked.filter(F.col("sample_rank") <= quota).select(
        id_col, source_col, "sample_rank"
    )


def oracle_mix_sample_sql(
    weights: dict[str, float],
    *,
    budget: int,
    source_sql: str = "SELECT doc_id, source FROM documents",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    cases = " ".join(
        f"WHEN {source_col} = '{n}' THEN {q}"
        for n, q in _mix_quotas(weights, budget)
    )
    h = f"cast('0x' || substr(md5('smp-' || cast({id_col} AS varchar)), 1, 7) AS BIGINT)"
    return f"""
    WITH src AS ({source_sql}),
    ranked AS (
      SELECT {id_col}, {source_col},
             row_number() OVER (PARTITION BY {source_col}
                                ORDER BY {h}, {id_col}) AS sample_rank
      FROM src
    )
    SELECT {id_col}, {source_col}, sample_rank
    FROM ranked
    WHERE sample_rank <= CASE {cases} ELSE 0 END
    """


# -------------------------------------------------------- split_assign

def _split_bounds(
    splits: Sequence[tuple[str, float]],
) -> list[tuple[str, int]]:
    """Cumulative bucket upper bounds for the named splits — shared by
    split_assign, its oracle, and split_leakage so the three can never
    disagree on a boundary."""
    total = sum(w for _, w in splits)
    bounds, acc = [], 0.0
    for name, w in splits:
        acc += w / total
        bounds.append((name, int(round(acc * SPLIT_BUCKETS))))
    return bounds


def _split_hash(id_expr: str, engine: str = "spark") -> str:
    """The split hash-bucket expression over an arbitrary id
    EXPRESSION (not just a source column — split_leakage applies it to
    pair columns), rendered for either engine. Byte-identical to the
    expression split_assign has always generated, so existing split
    assignments (and split_assign's certified plan) are unchanged."""
    if engine == "duck":
        return (
            f"cast('0x' || substr(md5('split-' || cast({id_expr} AS varchar))"
            f", 1, 7) AS BIGINT) % {SPLIT_BUCKETS}"
        )
    return (
        f"cast(conv(substring(md5(concat('split-', cast({id_expr} as string))), "
        f"1, 7), 16, 10) as bigint) % {SPLIT_BUCKETS}"
    )


def _split_case_sql(
    id_expr: str, bounds: Sequence[tuple[str, int]], engine: str
) -> str:
    """Inline CASE mapping an id expression straight to its split name
    (hash + boundary walk in one expression, for call sites that don't
    want the intermediate bucket column)."""
    h = _split_hash(id_expr, engine)
    whens = " ".join(
        f"WHEN {h} < {ub} THEN '{name}'" for name, ub in bounds[:-1]
    )
    return f"CASE {whens} ELSE '{bounds[-1][0]}' END"


def split_assign(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    carry: Sequence[str] = (),
) -> DataFrame:
    """Assign every document to a named split by hash bucket:
    (id, *carry, bucket, split). Pure projection — the assignment is a
    function of the id alone, so it never shuffles, never drifts as the
    corpus grows, and any engine recomputes it identically."""
    bounds = _split_bounds(splits)
    h = _split_hash(id_col)
    expr = None
    for name, ub in bounds[:-1]:
        cond = F.col("bucket") < F.lit(ub)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(bounds[0][0]) if expr is None else expr.otherwise(bounds[-1][0])
    )
    return (
        docs.select(F.col(id_col), *[F.col(c) for c in carry])
        .withColumn("bucket", F.expr(h))
        .withColumn("split", expr)
    )


def oracle_split_assign_sql(
    source_sql: str = "SELECT doc_id, source FROM documents",
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    carry: Sequence[str] = ("source",),
) -> str:
    bounds = _split_bounds(splits)
    h = _split_hash(id_col, "duck")
    cases = " ".join(
        f"WHEN bucket < {ub} THEN '{name}'" for name, ub in bounds[:-1]
    )
    cols = "".join(f", {c}" for c in carry)
    return f"""
    WITH src AS ({source_sql}),
    b AS (SELECT {id_col}{cols}, {h} AS bucket FROM src)
    SELECT {id_col}{cols}, bucket,
           CASE {cases} ELSE '{bounds[-1][0]}' END AS split
    FROM b
    """


# -------------------------------------------------------- split_leakage

def split_leakage(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    k: int = 3,
    threshold: float = 0.5,
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
    max_df: int | None = None,
) -> DataFrame:
    """Cross-split near-duplicate LEAKAGE report (NEW r09): every
    near-dup pair (exact n-gram Jaccard ≥ ``threshold`` within
    ``block_col``, the :func:`~streamtasks_spark.llmdata.dedup.
    ngram_jaccard_pairs` machinery) whose two documents land in
    DIFFERENT :func:`split_assign` splits — i.e. a validation/test
    document that is a near-copy of a training document. Held-out
    perplexity and eval scores on leaked items measure memorization,
    not generalization (the within-corpus counterpart of
    :func:`decontaminate`, which audits against an EXTERNAL eval set);
    this is the report a data owner reads before trusting a split.
    Output: (doc_a, doc_b, jaccard, split_a, split_b), unordered pairs
    doc_a < doc_b, only rows with split_a ≠ split_b.

    100 TB shape: the split names are computed INLINE from the pair's
    own id columns — :func:`split_assign` is a pure hash function of
    the id, so there is no join back to the corpus and no shuffle
    beyond the ones the jaccard pair generation already does (the
    prefix-filtered posting self-join). ``max_df`` passes through to
    the pair generator's hot-shingle guard. A leaked pair is dropped
    by the guard only if under-merged there — same contract, same
    direction (under-REPORT, never a false leak; the exact verify step
    guarantees every reported pair truly exceeds the threshold)."""
    from streamtasks_spark.llmdata.dedup import ngram_jaccard_pairs

    bounds = _split_bounds(splits)
    pairs = ngram_jaccard_pairs(
        docs,
        id_col=id_col,
        text_col=text_col,
        block_col=block_col,
        k=k,
        threshold=threshold,
        max_df=max_df,
    )
    return (
        pairs.withColumn(
            "split_a", F.expr(_split_case_sql("doc_a", bounds, "spark"))
        )
        .withColumn(
            "split_b", F.expr(_split_case_sql("doc_b", bounds, "spark"))
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "jaccard", "split_a", "split_b")
    )


def oracle_split_leakage_sql(
    source_sql: str = "SELECT doc_id, text, lang FROM documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str = "lang",
    k: int = 3,
    threshold: float = 0.5,
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
) -> str:
    """DuckDB twin of :func:`split_leakage` — the brute-force jaccard
    oracle composed with the same inline split-hash CASE on the pair
    columns (the engine's prefix filter is an exact optimization, so
    the pair sets must be identical)."""
    from streamtasks_spark.llmdata.dedup import oracle_ngram_jaccard_sql

    bounds = _split_bounds(splits)
    inner = oracle_ngram_jaccard_sql(
        source_sql, id_col, text_col, block_col, k, threshold
    )
    return f"""
    WITH p AS ({inner}),
    s AS (
      SELECT doc_a, doc_b, jaccard,
        {_split_case_sql("doc_a", bounds, "duck")} AS split_a,
        {_split_case_sql("doc_b", bounds, "duck")} AS split_b
      FROM p
    )
    SELECT doc_a, doc_b, jaccard, split_a, split_b
    FROM s WHERE split_a <> split_b
    """


# -------------------------------------------------------- corpus_prepare


def corpus_prepare(
    docs: DataFrame,
    eval_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str = "n_chars",
    dedup_threshold: float = 0.5,
    decontam_n: int = 8,
    dedup_max_bucket: int | None = 1000,
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
) -> DataFrame:
    """END-TO-END corpus preparation: the full pretraining data path —
    quality rules → near-dup canonical keep → eval decontamination →
    split assignment — reported per (source, split) with drop reasons.

    ``dedup_max_bucket`` caps LSH band buckets inside the minhash stage
    (``_band_pairs``): real corpora WILL contain a degenerate
    near-equal class (boilerplate pages, empty docs) whose single band
    bucket otherwise emits m·(m−1)/2 pairs on one key. Equivalence: a
    doc in a capped bucket still pairs via its other N_BANDS−1 bands,
    and a class hot in EVERY band is the near-identical cluster whose
    members also collide in the exact-hash sense — only genuinely
    degenerate mega-classes lose recall, by design. The default (1000)
    is ~250× the largest observed band bucket at sf0.1 (4 docs) and
    ~300× at sf0.01 (3), so the DuckDB oracle — which has no cap —
    stays bit-identical at every test scale.

    Drop precedence (each doc counted once): quality > duplicate >
    contaminated. ``n_kept``/``kept_chars`` summarize the surviving
    corpus exactly as a downstream tokenize/pack stage would read it.

    100 TB shape — the reason this is NOT a chain of per-stage joins:
    - ONE corpus scan computes words, quality rules, split bucket and
      carries (source, chars): rules and split are narrow expressions,
      so they ride the same pass (`quality_filter` and `split_assign`
      are reused as expression vocabularies, not re-joined tables).
    - The two per-doc drop lists are orders of magnitude smaller than
      the corpus: LSH components are bounded by duplicate docs,
      eval-overlap by the benchmark set — both broadcast onto the scan.
    - The only full-width shuffle is the final bounded-key
      (source, split) aggregate, map-side combined.
    Separate scans DO exist inside pair generation (dedup_minhash) and
    n-gram overlap (decontaminate) — inherent to their shapes and each
    individually oracle-verified."""
    from .dedup import connected_components, dedup_minhash
    from .quality import _measures, _rule_conditions, _words_expr

    # scan 1: words + rules + split, single pass
    d = spread(docs, id_col).select(
        F.col(id_col),
        F.col(source_col),
        F.col(chars_col),
        F.expr(_words_expr(text_col)).alias("__w"),
    )
    m = _measures(d, id_col, source_col, chars_col)
    keep = " AND ".join(_rule_conditions().values())
    base = m.select(
        F.col(id_col),
        F.col(source_col),
        F.col(chars_col),
        F.expr(f"cast(({keep}) as int)").alias("__q"),
    )
    base = split_assign(
        base, id_col=id_col, splits=splits,
        carry=(source_col, chars_col, "__q"),
    )

    # small sides: non-canonical duplicate members, contaminated ids
    comp = connected_components(
        dedup_minhash(docs, id_col=id_col, text_col=text_col,
                      threshold=dedup_threshold,
                      max_bucket=dedup_max_bucket)
    )
    dup_members = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__dup_id")
    )
    contam = decontaminate(
        docs, eval_docs, id_col=id_col, text_col=text_col, n=decontam_n
    ).select(F.col(id_col).alias("__ct_id"))

    marked = (
        base.join(
            F.broadcast(dup_members),
            F.col(id_col) == F.col("__dup_id"), "left",
        )
        .join(F.broadcast(contam), F.col(id_col) == F.col("__ct_id"), "left")
        .select(
            source_col, "split", chars_col,
            F.when(F.col("__q") == 0, F.lit("drop_quality"))
            .when(F.col("__dup_id").isNotNull(), F.lit("drop_dup"))
            .when(F.col("__ct_id").isNotNull(), F.lit("drop_contam"))
            .otherwise(F.lit("keep")).alias("__st"),
        )
    )
    st = F.col("__st")
    return (
        marked.groupBy(source_col, "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((st == "drop_quality").cast("long")).alias("n_drop_quality"),
            F.sum((st == "drop_dup").cast("long")).alias("n_drop_dup"),
            F.sum((st == "drop_contam").cast("long")).alias("n_drop_contam"),
            F.sum((st == "keep").cast("long")).alias("n_kept"),
            F.sum(
                F.when(st == "keep", F.col(chars_col)).otherwise(F.lit(0))
            ).alias("kept_chars"),
        )
    )


def oracle_corpus_prepare_sql(
    source_sql: str = "SELECT doc_id, text, source, n_chars FROM documents",
    eval_sql: str = "SELECT doc_id, text FROM documents WHERE doc_id % 25 = 7",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    chars_col: str = "n_chars",
    dedup_threshold: float = 0.5,
    decontam_n: int = 8,
    splits: Sequence[tuple[str, float]] = DEFAULT_SPLITS,
) -> str:
    """DuckDB oracle for :func:`corpus_prepare`, composed from the four
    stage oracles (quality rules, minhash pairs → recursive-CTE
    components, decontaminate overlap, split buckets) — validating the
    whole pipeline's wiring, not just each stage. BIGINT casts on every
    integer sum (HUGEINT trap)."""
    from .dedup import (
        oracle_connected_components_sql,
        oracle_dedup_minhash_sql,
    )
    from .quality import oracle_quality_filter_sql

    qf = oracle_quality_filter_sql(source_sql, id_col=id_col,
                                   text_col=text_col)
    cc = oracle_connected_components_sql(
        oracle_dedup_minhash_sql(source_sql, id_col=id_col,
                                 text_col=text_col,
                                 threshold=dedup_threshold)
    )
    ct = oracle_decontaminate_sql(source_sql, eval_sql, id_col=id_col,
                                  text_col=text_col, n=decontam_n)
    sp = oracle_split_assign_sql(source_sql, id_col=id_col, splits=splits,
                                 carry=(source_col, chars_col))
    return f"""
    WITH __qf AS ({qf}),
    __cc AS ({cc}),
    __ct AS ({ct}),
    __sp AS ({sp}),
    __m AS (
      SELECT __sp.{source_col} AS {source_col}, __sp.split AS split,
        __sp.{chars_col} AS {chars_col},
        CASE
          WHEN __qf.keep = 0 THEN 'drop_quality'
          WHEN __cc.node IS NOT NULL AND __cc.node <> __cc.component
            THEN 'drop_dup'
          WHEN __ct.{id_col} IS NOT NULL THEN 'drop_contam'
          ELSE 'keep'
        END AS __st
      FROM __sp
      JOIN __qf ON __sp.{id_col} = __qf.{id_col}
      LEFT JOIN __cc ON __sp.{id_col} = __cc.node
      LEFT JOIN __ct ON __sp.{id_col} = __ct.{id_col}
    )
    SELECT {source_col}, split,
      CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(CASE WHEN __st = 'drop_quality' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_drop_quality,
      CAST(sum(CASE WHEN __st = 'drop_dup' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_drop_dup,
      CAST(sum(CASE WHEN __st = 'drop_contam' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_drop_contam,
      CAST(sum(CASE WHEN __st = 'keep' THEN 1 ELSE 0 END) AS BIGINT)
        AS n_kept,
      CAST(sum(CASE WHEN __st = 'keep' THEN {chars_col} ELSE 0 END)
           AS BIGINT) AS kept_chars
    FROM __m
    GROUP BY {source_col}, split
    """
