#!/usr/bin/env python
"""Measured scale-up probe: replicate the sf0.1 corpus 1×/10×/100× and
time the bucketed dedup / corpus operators at each size.

This is the empirical companion to SCALE.md: the dedup tier's claim is
that banded LSH / blocked candidate generation keeps pair formation
near-LINEAR in corpus size (an all-pairs design would be quadratic —
10× data → 100× time). The probe replicates documents with id offsets
and salted text mutations (so replicas are near-dups of their original,
not byte-identical — the worst realistic case: duplicate classes GROW
with scale), runs each operator at n×, and prints the observed scaling
exponent log(t_100/t_1)/log(100).

Usage: python scripts/scale_probe.py [--factors 1,10,100]
Writes nothing outside /tmp; prints one JSON line per (op, factor).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamtasks_spark.llmdata import dedup, pipeline, textstats  # noqa: E402
from streamtasks_spark.session import get_spark, read_parquet  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicate(spark, factor: int):
    """factor copies of documents: copy 0 verbatim; copy k>0 re-ids the
    doc and appends a per-copy suffix token, so each original spawns a
    family of NEAR-duplicates (shingle overlap high but not 1.0)."""
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    if factor == 1:
        return docs
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    return (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("__copy") * 10_000_000).alias("doc_id"),
            F.when(F.col("__copy") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(" ", F.col("text"),
                            F.concat(F.lit("copytag"), F.col("__copy")))
            ).alias("text"),
            "lang", "source", "n_chars",
        )
    )


def probe_ops(spark, docs):
    n = docs.count()
    yield "dedup_minhash", lambda: dedup.dedup_minhash(docs, threshold=0.5), n
    # max_local_edges=0: the probe measures the DISTRIBUTED star loop —
    # the 100 TB path whose scaling exponent SCALE.md claims; the
    # adaptive driver union-find would otherwise absorb the small
    # factors and make the exponent incomparable across rows
    yield "dedup_components", lambda: dedup.connected_components(
        dedup.dedup_minhash(docs, threshold=0.5), max_local_edges=0
    ), n
    yield "substring_dedup", lambda: dedup.substring_dup_spans(docs), n
    yield "vocab_topk", lambda: textstats.vocab_topk(docs, k=100), n
    yield "tfidf_topk", lambda: textstats.tfidf_topk(docs, k=5), n
    yield "quality_buckets", lambda: textstats.quality_buckets(docs), n
    ev = docs.filter(F.col("doc_id") % 25 == 7)
    yield "corpus_prepare", lambda: pipeline.corpus_prepare(docs, ev), n
    yield "doc_chunk", lambda: pipeline.doc_chunk(docs), n
    from streamtasks_spark.llmdata import quality
    yield "unigram_lm", lambda: quality.unigram_lm(docs), n
    # r08 ops: containment shares ngram_jaccard's blocked-candidate
    # scaling claim; dsir shares unigram_lm's explode+broadcast shape
    yield "ngram_containment", lambda: dedup.ngram_containment_pairs(
        docs, threshold=0.6
    ), n
    yield "dsir_weights", lambda: quality.dsir_weights(
        docs, target_pred="lang = 'en'"
    ), n
    # r09: contamination_report streams the corpus grams once against a
    # broadcast eval set (eval side grows with the corpus here — the
    # harsher-than-production case, production eval sets are fixed);
    # split_leakage shares ngram_jaccard's blocked scaling claim plus a
    # zero-join split projection; importance_resample shares
    # dsir_weights' shape plus a per-row coin
    yield "contamination_report", lambda: pipeline.contamination_report(
        docs.filter(F.col("doc_id") % 25 != 7), ev
    ), n
    yield "split_leakage", lambda: pipeline.split_leakage(
        docs, threshold=0.5, splits=(("train", 0.5), ("heldout", 0.5)),
        max_df=1000,
    ), n
    yield "importance_resample", lambda: quality.importance_resample(
        docs, target_pred="lang = 'en'"
    ), n
    # dedup_against: the new-crawl slice grows WITH the corpus here
    # (1/3 of it), so both sides scale — harsher than production's
    # fixed-increment shape
    yield "dedup_against", lambda: dedup.dedup_against(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
        threshold=0.5, max_df=1000,
    ), n
    # r09 fifth wave: bm25 is one narrow scan + broadcast stats (claim:
    # linear with tiny constants); bloom's probe side grows with the
    # corpus AND its reference bit-set fills (worst case: both sides
    # scale); ngram_lm shares unigram_lm's explode+broadcast shape over
    # ~1x more units (n-grams of a w-word doc: w-n+1)
    yield "bm25_topk", lambda: textstats.bm25_topk(
        docs, terms=("spark", "hash", "window", "merge"), k=15
    ), n
    yield "bloom_dedup", lambda: dedup.bloom_dedup(
        docs.filter(F.col("doc_id") % 3 == 0),
        docs.filter(F.col("doc_id") % 3 != 0),
        m_bits=1 << 20,
    ), n
    yield "ngram_lm", lambda: quality.ngram_lm(docs, n=2), n
    # r09 eighth-tenth waves: bm25_search's shuffle carries only
    # query-term occurrences (broadcast semi-prune first); the two
    # sketches aggregate to FIXED-size states (d·w cells / 2^p
    # registers) — their heavy side is the exact-verification column,
    # which is the oracle's burden, not the sketch's
    yield "bm25_search", lambda: textstats.bm25_search(
        docs,
        docs.sparkSession.createDataFrame(
            [(0, ["spark", "hash"]), (1, ["window", "merge", "sort"]),
             (2, ["table", "scan", "value", "row"])],
            "query_id long, terms array<string>",
        ),
        k=10,
    ), n
    yield "heavy_hitters", lambda: textstats.heavy_hitters_cms(
        docs, width=256, depth=4, phi=0.005
    ), n
    yield "approx_distinct", lambda: textstats.approx_distinct_hll(
        docs, n=3, p=8
    ), n
    # r11 third wave: bpe_train's per-round work is VOCABULARY-bound
    # (Heaps' law — the replicated corpus barely grows the vocab, its
    # word salt adds one token family per copy), so only the one word
    # count should scale; bpe_token_count adds the corpus-sized
    # broadcast-join recount back on top
    from streamtasks_spark.llmdata import bpe

    yield "bpe_train", lambda: bpe.bpe_train(docs, n_merges=8), n
    yield "bpe_token_count", lambda: bpe.bpe_token_count(
        docs, n_merges=8
    ), n


def replicate_vectors(spark, factor: int):
    """factor copies of embeddings: copy 0 verbatim; copy k>0 re-ids
    the vector and tilts it by a per-copy deterministic per-component
    factor (1 + 0.05·k·sin(i·(1+k))) — a DIRECTION change, since pure
    scaling is invisible to cosine. Each original spawns a family
    whose members drift apart with copy distance, so near-dup output
    grows ~linearly with family size (adjacent copies pair, far ones
    don't) instead of quadratically — the probe then measures
    candidate-generation scaling, not output volume."""
    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    if factor == 1:
        return vecs
    copies = spark.range(factor).select(F.col("id").alias("__copy"))
    return (
        vecs.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("__copy") * 10_000_000).alias(
                "vec_id"
            ),
            # per-copy PHASE (i·(1+k)) decorrelates the tilt directions:
            # copy k drifts toward its own direction with angle ∝ k, so
            # only a bounded neighborhood of low-k copies stays within
            # the near-dup threshold of the original — without this, all
            # copies tilt along ONE direction and far copies become
            # parallel to each other (every family all-pairs near-dup,
            # output quadratic in factor, exponent meaningless)
            F.expr(
                "transform(embedding, (x, i) -> cast("
                "x * (1.0d + 0.05d * __copy * sin(i * (1 + __copy))) "
                "as float))"
            ).alias("embedding"),
            "label",
        )
    )


def probe_vector_ops(spark, vecs, queries, factor: int):
    from streamtasks_spark.llmdata import similarity

    n = vecs.count()
    yield "lsh_topk", lambda: similarity.lsh_topk(
        vecs, queries, n_planes=4, k=5
    ), n
    yield "ivf_topk", lambda: similarity.ivf_topk(
        vecs, queries, n_cells=8, n_probe=2, k=5
    ), n
    # r08: sq_topk scans all pairs by design (it is the compressed
    # BRUTE tier) — expected exponent ~1 in corpus size; the claim is
    # the constant (int codes), not the asymptote
    yield "sq_topk", lambda: similarity.sq_topk(
        vecs, queries, k=5, rerank=4
    ), n
    # r09: pq_topk is also a linear-by-design compressed scan — the
    # claim is the 32x constant (m_sub int lookups per pair) plus the
    # codebook-sized training pulls, not the asymptote
    yield "pq_topk", lambda: similarity.pq_topk(
        vecs, queries, n_codes=16, k=5, rerank=8
    ), n
    # r09 seventh wave: semantic_decontaminate's eval side stays FIXED
    # (the production shape — benchmarks don't grow with the corpus),
    # so the exponent isolates the corpus-side scan; cluster_profile
    # is training (codebook-sized pulls) + one narrow assignment scan
    # + an n_cells-key rollup
    yield "semantic_decontaminate", lambda: similarity.semantic_decontaminate(
        vecs.filter(F.col("vec_id") >= 10), queries.select("vec_id", "embedding"),
        threshold=0.35,
    ), n
    yield "cluster_profile", lambda: similarity.cluster_profile(
        vecs, n_cells=8, n_iters=3
    ), n
    # r10: cluster_prune adds a broadcast keep-rate rollup and ONE
    # cell-key rank window on top of cluster_profile's narrow
    # assignment — per-task work bounded by cell population (n_cells
    # is the deployment knob, as in semantic_dedup)
    yield "cluster_prune", lambda: similarity.cluster_prune(
        vecs, n_cells=8, n_iters=3
    ), n
    # r10: the IVF_PQ composite — cells bound WHICH vectors a query
    # touches, codes bound what touching one costs; expected to track
    # ivf_topk's shape with a smaller per-candidate constant
    yield "ivf_pq_topk", lambda: similarity.ivf_pq_topk(
        vecs, queries, n_cells=8, n_probe=2, n_codes=16, k=5, rerank=8
    ), n
    # threshold 0.9 + the decorrelated tilt bounds each vector's true
    # near-dup neighborhood to a few adjacent copies: output saturates
    # per family, so the exponent measures candidate generation.
    # FIXED plane count: bucket population grows linearly with the
    # corpus and within-bucket pairing quadratically — the documented
    # failure mode of leaving the knob alone. Capped at ≤16× (the
    # quadratic term makes 100× a ~half-hour run that only re-measures
    # the known term); the skip is printed, not silent.
    if factor <= 16:
        yield "embedding_near_dup_fixed_planes", (
            lambda: similarity.embedding_near_dup(
                vecs, n_planes=4, threshold=0.9
            )
        ), n
    else:
        print(json.dumps({
            "op": "embedding_near_dup_fixed_planes", "factor": factor,
            "skipped": "fixed 4-plane config is quadratic-in-bucket; "
            "measured through 16x, the 100 TB path is scaled planes",
        }), flush=True)
    # SCALED plane count (4 + log2(factor)): bucket count tracks corpus
    # size so expected bucket population stays constant — the knob a
    # 100 TB deployment actually turns (recall per plane drops as
    # buckets shrink; n_out in the output line shows the trade).
    p = 4 + max(0, round(math.log2(factor)))
    yield "embedding_near_dup_scaled_planes", (
        lambda: similarity.embedding_near_dup(
            vecs, n_planes=p, threshold=0.9
        )
    ), n
    # BANDED scaled planes: 4 independent plane sets of the same
    # scaled width, OR'd (dedup_minhash's band structure applied to
    # SimHash) — the recall recovery for the single scaled set's
    # recall loss. Measured against BRUTE-FORCE ground truth at 10×
    # (89,723 true pairs ≥0.9 over the 20k-vector corpus): single
    # scaled set 57.4%, fixed-4-planes 72.8%, 3 bands 90.9%, 4 bands
    # 95.4% (matching the 1-(1-r)^B independence estimate). Cost is
    # ~bands× the per-band candidate volume — still bucket-bounded,
    # same scaling exponent as the single set.
    yield "embedding_near_dup_banded", (
        lambda: similarity.embedding_near_dup(
            vecs, n_planes=p, threshold=0.9, bands=4
        )
    ), n
    # semantic_dedup with n_cells ∝ factor — the knob a deployment
    # turns (cell population, not corpus size, bounds the quadratic
    # within-cell pairing; the SemDeDup paper scales clusters with the
    # corpus the same way). The literal-inlined codebook caps this
    # probe's range at a few hundred cells (the inlined argmax grows
    # with n_cells·dim; past ~10^3 cells assignment should move to
    # IvfIndex's broadcast-join path) — factors ≤ 16 stay well under.
    if factor <= 16:
        c = 8 * factor
        yield "semantic_dedup_scaled_cells", (
            lambda: similarity.semantic_dedup(
                vecs, n_cells=c, n_iters=2, threshold=0.9
            )
        ), n
    else:
        print(json.dumps({
            "op": "semantic_dedup_scaled_cells", "factor": factor,
            "skipped": "literal-inlined codebook impractical past a few "
            "hundred cells; measured through 16x",
        }), flush=True)


ONLY_OPS: set[str] | None = None


def time_op(spark, results, name, factor, line_fields, run) -> None:
    """Time one (op, factor) cell with a cold cache; record it in
    ``results`` and print the per-cell JSON line. ``run`` materializes
    the op and may return extra fields for the line (e.g. n_out).
    Ops outside ``--ops`` (when given) are skipped."""
    if ONLY_OPS is not None and name not in ONLY_OPS:
        return
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    extra = run() or {}
    dt = time.perf_counter() - t0
    results.setdefault(name, {})[factor] = dt
    print(json.dumps({
        "op": name, "factor": factor, **line_fields,
        "sec": round(dt, 3), **extra,
    }), flush=True)


def print_exponents(results: dict[str, dict[int, float]]) -> None:
    """One summary line per op over the op's own measured span (ops
    skipped at some factors — e.g. the fixed-planes cap — get the span
    they actually ran)."""
    for name, r in results.items():
        lo, hi = min(r), max(r)
        if lo == hi:
            continue
        exp = math.log(r[hi] / r[lo]) / math.log(hi / lo)
        print(json.dumps({
            "op": name, "scaling_exponent": round(exp, 3),
            "span": f"{lo}x..{hi}x",
            "verdict": "sub-linear-to-linear" if exp <= 1.15
            else ("super-linear" if exp < 1.7 else "QUADRATIC-SUSPECT"),
        }), flush=True)


def probe_vectors(spark, factors) -> int:
    """ANN-tier twin of the corpus probe: replicate embeddings with
    mutated near-dup families, fix the query set (10 copy-0 vectors, so
    query-side work is constant and the exponent isolates corpus-side
    scaling), time each tier at every factor."""
    results: dict[str, dict[int, float]] = {}
    for factor in factors:
        vecs = replicate_vectors(spark, factor)
        with tempfile.TemporaryDirectory(prefix=f"vscale{factor}_") as td:
            vecs.write.mode("overwrite").parquet(f"{td}/embeddings.parquet")
            mat = spark.read.parquet(f"{td}/embeddings.parquet")
            queries = mat.filter(F.col("vec_id") < 10)
            for name, thunk, _n in probe_vector_ops(
                spark, mat, queries, factor
            ):
                time_op(
                    spark, results, name, factor, {"n_vecs": _n},
                    lambda t=thunk: {"n_out": t().count()},
                )
    print_exponents(results)
    return 0


def probe_incremental(spark, n_batches: int) -> int:
    """Incremental-ingest probe for MinHashIndex: ingest ``n_batches``
    constant-size batches into one persistent index and time each.

    Batch k is the base corpus with every token salted by k, so batches
    share NO shingles across each other — cross-batch near-dup pairs
    don't exist and per-batch verified output stays constant. What
    grows is only the HISTORY the batch is checked against (the
    postings/hashes tables), so a flat per-batch time is exactly the
    claim that ingest cost is O(batch + collisions), not O(corpus):
    re-running one-shot dedup_minhash over the union instead would grow
    linearly with every batch. Prints one JSON line per batch plus a
    summary ratio of the last batch to the first (steady-state vs
    cold); ≤ ~1.3 including JIT/warm-up noise is 'flat'."""
    docs = read_parquet(spark, f"{SF_DIR}/documents.parquet")
    times = []
    with tempfile.TemporaryDirectory(prefix="mh_inc_") as td:
        idx = dedup.MinHashIndex(f"{td}/index", threshold=0.5)
        for k in range(n_batches):
            batch = docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"t -> concat(t, '{k}')), ' ')"
                ).alias("text"),
            )
            batch.write.mode("overwrite").parquet(f"{td}/batch.parquet")
            mat = spark.read.parquet(f"{td}/batch.parquet")
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            pairs = idx.ingest(mat)
            n_pairs = pairs.count()
            dt = time.perf_counter() - t0
            pairs.unpersist()
            times.append(dt)
            print(json.dumps({
                "op": "minhash_index_ingest", "batch": k,
                "history_batches": k, "sec": round(dt, 3),
                "n_pairs": n_pairs,
            }), flush=True)
    print(json.dumps({
        "op": "minhash_index_ingest",
        "first_batch_sec": round(times[0], 3),
        "last_batch_sec": round(times[-1], 3),
        "steady_ratio_last_over_second": round(times[-1] / times[1], 3)
        if len(times) > 2 else None,
        "verdict": "flat" if len(times) > 2 and times[-1] / times[1] <= 1.3
        else "growing",
    }), flush=True)
    return 0


def probe_incremental_sem(spark, n_batches: int) -> int:
    """Incremental-ingest probe for SemDedupIndex: ingest ``n_batches``
    constant-size embedding batches into one persistent index and time
    each. Batch k re-ids the base vectors and re-directions them with
    a per-batch component multiplier (1 + sin(i·(1+k·7919))) — the
    amplitude matters: a multiplicative tilt of amplitude a leaves
    cosine ≈ 1/√(1+a²/2) against the base REGARDLESS of phase (0.4
    still reads 0.96, above the 0.9 threshold, and history barely
    grew), so amplitude 1.0 (cos ≈ 0.82) is the smallest round value
    that makes batches genuinely novel. Most of each batch then
    survives and the kept-history side of the cell join grows
    ~linearly per batch — the honest setup for the flat-per-batch
    claim (a mostly-duplicate stream keeps history artificially
    small). Flat per-batch time is the
    O(batch + cell collisions) claim — a re-run of the one-shot op
    over the union would grow linearly per batch.
    ``n_cells`` is sized for the FINAL corpus (8·n_batches), the way a
    deployment pre-sizes its quantizer for expected volume."""
    from streamtasks_spark.llmdata import similarity

    base = replicate_vectors(spark, 1)
    times = []
    with tempfile.TemporaryDirectory(prefix="sem_inc_") as td:
        idx = similarity.SemDedupIndex(
            f"{td}/index", threshold=0.9, n_cells=8 * n_batches,
        )
        for k in range(n_batches):
            batch = base.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                F.expr(
                    f"transform(embedding, (x, i) -> cast("
                    f"x * (1.0d + 1.0d * sin(i * (1 + {k} * 7919))) "
                    f"as float))"
                ).alias("embedding"),
            )
            batch.write.mode("overwrite").parquet(f"{td}/batch.parquet")
            mat = spark.read.parquet(f"{td}/batch.parquet")
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            verdict = idx.ingest(mat)
            n_kept = verdict.filter(F.col("keep")).count()
            dt = time.perf_counter() - t0
            verdict.unpersist()
            times.append(dt)
            print(json.dumps({
                "op": "sem_index_ingest", "batch": k,
                "history_batches": k, "sec": round(dt, 3),
                "n_kept": n_kept,
            }), flush=True)
    print(json.dumps({
        "op": "sem_index_ingest",
        "first_batch_sec": round(times[0], 3),
        "last_batch_sec": round(times[-1], 3),
        "steady_ratio_last_over_second": round(times[-1] / times[1], 3)
        if len(times) > 2 else None,
        "verdict": "flat" if len(times) > 2 and times[-1] / times[1] <= 1.3
        else "growing",
    }), flush=True)
    return 0


def probe_incremental_ivfpq(spark, n_batches: int) -> int:
    """Incremental-ingest probe for IvfPqIndex (r10): ingest
    ``n_batches`` constant-size embedding batches into one persistent
    PQ-coded index — both codebooks frozen before batch 0 (the
    production train-once shape) — timing each ingest and a fixed
    3-query top-k after it.

    The ingest claim is FLAT per batch: encoding is a narrow
    literal-codebook projection over the batch and the append never
    touches history. The query claim is NOT flat — a probed cell's
    population grows with history — but the scan rows are m_sub-int
    code rows (32× smaller than floats) and the raw side table is
    touched only for rerank·k survivors, so query time should grow
    well below history's byte growth. Both printed per batch."""
    from streamtasks_spark.llmdata import similarity

    base = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    cents = similarity.train_centroids(base, n_cells=8, n_iters=2)
    cb = similarity.train_pq_codebooks(base, m_sub=8, n_codes=8)
    qs = base.filter(F.col("vec_id") < 3)
    ing, qry = [], []
    with tempfile.TemporaryDirectory(prefix="ivfpq_inc_") as td:
        idx = similarity.IvfPqIndex(f"{td}/index", n_cells=8, n_probe=2)
        for k in range(n_batches):
            batch = base.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                F.expr(
                    f"transform(embedding, (x, i) -> cast("
                    f"x * (1.0d + 1.0d * sin(i * (1 + {k} * 7919))) "
                    f"as float))"
                ).alias("embedding"),
            )
            batch.write.mode("overwrite").parquet(f"{td}/batch.parquet")
            mat = spark.read.parquet(f"{td}/batch.parquet")
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            idx.ingest(mat, codebook=cents, pq_codebooks=cb)
            dt = time.perf_counter() - t0
            t1 = time.perf_counter()
            n_hits = idx.query(qs, k=5).count()
            dq = time.perf_counter() - t1
            ing.append(dt)
            qry.append(dq)
            print(json.dumps({
                "op": "ivfpq_index", "batch": k, "history_batches": k,
                "ingest_sec": round(dt, 3), "query_sec": round(dq, 3),
                "n_hits": n_hits,
            }), flush=True)
        # the query growth above is dominated by small-files accretion
        # (each ingest appends part files into every cell dir);
        # compaction is the documented cure — measure it
        idx.compact(spark)
        spark.catalog.clearCache()
        t2 = time.perf_counter()
        idx.query(qs, k=5).count()
        post = time.perf_counter() - t2
    print(json.dumps({
        "op": "ivfpq_index_ingest",
        "first_batch_sec": round(ing[0], 3),
        "last_batch_sec": round(ing[-1], 3),
        "steady_ratio_last_over_second": round(ing[-1] / ing[1], 3)
        if len(ing) > 2 else None,
        "verdict": "flat" if len(ing) > 2 and ing[-1] / ing[1] <= 1.3
        else "growing",
    }), flush=True)
    print(json.dumps({
        "op": "ivfpq_index_query",
        "first_sec": round(qry[0], 3), "last_sec": round(qry[-1], 3),
        "history_growth": n_batches,
        "query_growth_ratio": round(qry[-1] / qry[1], 3)
        if len(qry) > 2 else None,
        "post_compact_sec": round(post, 3),
    }), flush=True)
    return 0


def main() -> int:
    factors = [1, 10, 100]
    for a in sys.argv[1:]:
        if a.startswith("--incremental-ivfpq"):
            n = int(a.split("=", 1)[1]) if "=" in a else 8
            return probe_incremental_ivfpq(get_spark("scale_probe"), n)
        if a.startswith("--incremental-sem"):
            n = int(a.split("=", 1)[1]) if "=" in a else 8
            return probe_incremental_sem(get_spark("scale_probe"), n)
        if a.startswith("--incremental"):
            n = int(a.split("=", 1)[1]) if "=" in a else 8
            return probe_incremental(get_spark("scale_probe"), n)
        if a.startswith("--factors"):
            factors = [int(x) for x in a.split("=", 1)[1].split(",")]
        if a.startswith("--ops"):
            # restrict to named ops — re-measuring one new op must not
            # re-run the whole tier's multi-minute matrix
            global ONLY_OPS
            ONLY_OPS = set(a.split("=", 1)[1].split(","))
    if "--vectors" in sys.argv[1:]:
        return probe_vectors(get_spark("scale_probe"), factors)
    spark = get_spark("scale_probe")
    results: dict[str, dict[int, float]] = {}
    for factor in factors:
        docs = replicate(spark, factor)
        # materialize the replicated input once so operator timings do
        # not include the replication cross-join itself
        with tempfile.TemporaryDirectory(prefix=f"scale{factor}_") as td:
            docs.write.mode("overwrite").parquet(f"{td}/documents.parquet")
            mat = spark.read.parquet(f"{td}/documents.parquet")
            for name, thunk, _n in probe_ops(spark, mat):
                time_op(
                    spark, results, name, factor, {"n_docs": _n},
                    lambda t=thunk: t()
                    .write.format("noop")
                    .mode("overwrite")
                    .save(),
                )
    print_exponents(results)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
