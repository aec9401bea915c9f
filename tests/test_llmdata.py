"""llmdata tier tests: dedup recall/precision against exact baselines.

Model (SURVEY §5): drive the approximate operators (minhash-LSH, simhash)
against exact reference computations on the same data and assert the
structural guarantees — LSH recall at high jaccard, pigeonhole recall for
chunk-blocked simhash, normalization collapse for exact dedup.
"""

from __future__ import annotations

import itertools
import re

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.llmdata import dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from streamtasks_spark.session import read_parquet

    return read_parquet(spark, f"{SF_DIR}/documents.parquet").cache()


def python_jaccard_pairs(rows, k=3, threshold=0.5):
    def shingles(t):
        toks = re.sub(r"\s+", " ", t.lower().strip()).split(" ")
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    sh = {r["doc_id"]: shingles(r["text"]) for r in rows}
    out = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        u = sh[a] | sh[b]
        if not u:
            continue
        j = len(sh[a] & sh[b]) / len(u)
        if j >= threshold:
            out[(a, b)] = j
    return out


def test_dedup_exact_collapses_whitespace_variants(spark, docs):
    base = docs.select("doc_id", "text")
    dups = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.lit(" \t"), F.col("text"), F.lit("  ")).alias("text"),
    )
    n_dups = dups.count()
    out = dedup.dedup_exact(base.unionByName(dups)).collect()
    assert sum(1 for r in out if r["n_docs"] == 2) == n_dups
    # keep_id is always the original (smaller) id
    for r in out:
        if r["n_docs"] == 2:
            assert r["keep_id"] < 10_000


def test_minhash_lsh_finds_exact_jaccard_pairs(spark, docs):
    rows = docs.select("doc_id", "text").collect()
    expected = python_jaccard_pairs(rows, threshold=0.5)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_minhash(docs, threshold=0.5).collect()
    }
    # every found pair is genuinely >= threshold and jaccard is exact
    for (a, b), j in got.items():
        assert (a, b) in expected
        assert abs(expected[(a, b)] - j) < 1e-6
    # recall at j >= 0.9 must be total (detection prob ~0.99998 per pair,
    # deterministic for the fixed permutation constants)
    high = {p for p, j in expected.items() if j >= 0.9}
    assert high <= set(got)


def test_minhash_hot_bucket_cap_bounds_pairs(spark):
    """The skew guard: a giant class of identical docs lands every copy
    in the same bucket of EVERY band; with max_bucket set below the
    class size, those postings are dropped before pairing, so the hot
    class emits no pairs while unrelated near-dup pairs still emerge."""
    hot = [(i, "spark shuffles the big table by key every single time") for i in range(40)]
    # one genuine near-dup pair, distinct from the hot class
    pair = [
        (100, "the quick brown fox jumps over the lazy dog today"),
        (101, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(hot + pair, "doc_id long, text string")
    uncapped = dedup.dedup_minhash(df, threshold=0.5).collect()
    assert sum(1 for r in uncapped if r["doc_a"] < 100) == 40 * 39 // 2
    capped = dedup.dedup_minhash(df, threshold=0.5, max_bucket=10).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert all(a >= 100 for a, _ in got), got
    assert (100, 101) in got


def test_simhash_blocking_has_exact_recall(spark, docs):
    """Every pair within hamming<=3 must be found (pigeonhole over 4
    chunks) — compare against all-pairs hamming on the full signatures."""
    out = dedup.dedup_simhash(docs, max_hamming=3)
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}

    # recompute full signatures without blocking, brute-force all pairs
    toks = (
        "array_distinct(transform(split(lower(trim(text)), '\\\\s+'), "
        "t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)))"
    )
    base = docs.select("doc_id", F.expr(toks).alias("th"))
    bits = " + ".join(
        f"(case when aggregate(th, 0L, (acc, h) -> acc + "
        f"(shiftright(h, {j}) % 2) * 2 - 1) > 0 then {1 << j}L else 0L end)"
        for j in range(dedup.SIMHASH_BITS)
    )
    sims = {
        r["doc_id"]: r["sim"]
        for r in base.withColumn("sim", F.expr(bits)).collect()
    }
    for a, b in itertools.combinations(sorted(sims), 2):
        h = bin(sims[a] ^ sims[b]).count("1")
        if h <= 3:
            assert (a, b) in found and found[(a, b)] == h
        else:
            assert (a, b) not in found


def test_ngram_jaccard_matches_python_model(spark, docs):
    rows = docs.select("doc_id", "text").collect()
    langs = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    expected = {
        p: j
        for p, j in python_jaccard_pairs(rows, threshold=0.5).items()
        if langs[p[0]] == langs[p[1]]
    }
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert set(got) == set(expected)
    for p, j in got.items():
        assert abs(expected[p] - j) < 1e-6


def test_ngram_containment_asymmetry_and_oracle(spark):
    """Containment semantics (r08): a paragraph wholly embedded in a
    much longer doc has containment 1.0 in the short→long direction
    while Jaccard (and the reverse direction) stay below threshold —
    the quote/boilerplate-inclusion class. Also bit-exact vs the
    brute-force DuckDB oracle across (k, threshold) geometries on the
    real corpus."""
    import duckdb

    para = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    rows = [
        (1, para, "en"),
        (2, filler + " " + para + " " + filler, "en"),
        (3, "completely different text about other topics entirely", "en"),
        (4, para, "de"),  # cross-block: must never pair with 1 or 2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.ngram_containment_pairs(docs, threshold=0.9).collect()
    }
    assert got.get((1, 2)) == 1.0          # short fully inside long
    assert (2, 1) not in got               # long not contained in short
    assert all(3 not in p and 4 not in p for p in got)
    # jaccard at the same threshold misses the inclusion entirely
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    assert all({r["doc_a"], r["doc_b"]} != {1, 2} for r in jac)

    sf_dir = "/root/testdata/sf0.001"
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for k, thr in ((3, 0.6), (2, 0.8), (4, 0.5)):
        sdf = (
            dedup.ngram_containment_pairs(corpus, k=k, threshold=thr)
            .toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        odf = (
            con.execute(dedup.oracle_ngram_containment_sql(k=k, threshold=thr))
            .df().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        )
        assert len(sdf) == len(odf) and len(sdf) > 0, (k, thr)
        assert (sdf.values == odf.values).all(), (k, thr)


def test_ngram_containment_max_df_guard_under_merges_only(spark):
    """The r09 hot-shingle guard (VERDICT r08 task 5): a degenerate
    all-stopword document's rarity prefix IS the corpus-hot shingles,
    fanning out against the full b-side posting list. With max_df set,
    hot shingles leave candidate generation on both sides. Contract:
    (1) guarded results ⊆ exact unguarded results — NEVER a mis-merge;
    (2) pairs witnessed by any rare prefix shingle survive;
    (3) a pair whose only shared prefix shingles are hot is dropped —
    the documented under-merge, the same error direction as
    max_bucket/max_cell; (4) an inert (large) cap is value-identical
    to no cap."""
    hot = "the quick fox"                      # one hot 3-gram shingle
    rare = " ".join(f"r{i}" for i in range(10))
    rows = (
        # 10 docs carrying the hot shingle -> its df = 12 incl. 90/91
        [(i, f"{hot} u{i}a u{i}b u{i}c u{i}d", "en") for i in range(10)]
        + [
            # genuine near-dup pair on RARE shingles (plus unique tails)
            (80, rare + " t80a t80b", "en"),
            (81, rare + " t81a t81b t81c t81d", "en"),
            # degenerate stopword docs: every shingle they share is hot
            (90, hot, "en"),
            (91, hot + " " + hot, "en"),
        ]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def pairs(**kw):
        return {
            (r["doc_a"], r["doc_b"]): r["containment"]
            for r in dedup.ngram_containment_pairs(
                docs, threshold=0.6, **kw
            ).collect()
        }

    exact = pairs()
    guarded = pairs(max_df=5)
    # (1) under-merge only: no invented or re-scored pairs
    assert set(guarded) <= set(exact)
    assert all(exact[p] == c for p, c in guarded.items())
    # (2) the rare-shingle near-dup pair survives the guard
    assert (80, 81) in guarded and (81, 80) in guarded
    # (3) the hot-witnessed pair existed exactly (doc 90's single
    # shingle IS the hot one, contained in 91) and is dropped by the
    # guard; 91→90 was never a pair (91's phrase repetition creates
    # rare cross-boundary shingles diluting its containment below t)
    assert exact.get((90, 91)) == 1.0
    assert (90, 91) not in guarded
    # hot-anchored asymmetric containments (90 ⊆ each hot-carrier
    # doc) are likewise rate-limited away
    assert any(a == 90 and b < 10 for (a, b) in exact)
    assert not any(a == 90 and b < 10 for (a, b) in guarded)
    # (4) a cap above every df is byte-inert (the entry call's shape)
    assert pairs(max_df=1000) == exact


def test_sq_topk_recall_and_exactness_vs_brute_force(spark):
    """int8 scalar-quantized top-k (r08): every returned cosine equals
    the exact brute-force cosine bit-for-bit (the re-rank is exact —
    quantization only shapes CANDIDATE selection), the quantized
    approx score sits within 2e-2 of the true cosine, and recall@5
    against exact cosine_topk is high (int8 error is far inside top-k
    margins on this corpus)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 20)
    brute = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(vecs, qs, k=5).collect()
    }
    got = similarity.sq_topk(vecs, qs, k=5, rerank=4).collect()
    assert len(got) == len(brute)
    for r in got:
        assert abs(r["approx"] - r["cosine"]) < 2e-2, r
        if (r["query_id"], r["vec_id"]) in brute:
            assert r["cosine"] == brute[(r["query_id"], r["vec_id"])]
    hits = sum((r["query_id"], r["vec_id"]) in brute for r in got)
    recall = hits / len(brute)
    assert recall >= 0.9, recall


def test_ivf_sq_topk_converges_to_ivf_topk_at_full_rerank(spark):
    """IVF×SQ (r08): when rerank·k covers every probed cell's
    population, the quantized candidate stage is a no-op filter and the
    exact re-rank must reproduce plain ivf_topk's (query, vec, cosine,
    rank) frame EXACTLY; at the production rerank=4 the result stays a
    high-recall subset ranked by true cosine."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 20)
    ivf = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.ivf_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5
        ).collect()
    }
    full = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.ivf_sq_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5, rerank=10**6
        ).collect()
    }
    assert full == ivf
    prod = similarity.ivf_sq_topk(
        vecs, qs, n_cells=8, n_probe=2, k=5, rerank=4
    ).collect()
    hits = sum((r["query_id"], r["vec_id"]) in ivf for r in prod)
    assert hits / len(ivf) >= 0.9, hits / len(ivf)
    for r in prod:  # exact re-rank: returned cosines are true cosines
        if (r["query_id"], r["vec_id"]) in ivf:
            assert r["cosine"] == ivf[(r["query_id"], r["vec_id"])][0]
        assert abs(r["approx"] - r["cosine"]) < 2e-2


def test_lsh_topk_recall_vs_brute_force(spark):
    """LSH top-k is exact within the bucket; assert exact score agreement
    on every returned true-match and a loose recall floor. On random
    UNCLUSTERED vectors single-table sign-LSH recall is inherently low
    (neighbors at cos≈0.3 flip signs often) — real corpora with genuine
    near-dup structure (cos>0.9) land in the same bucket w.h.p.; multi-
    table OR-ing is the production lever, not asserted here."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 20)
    brute = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.cosine_topk(vecs, qs, k=5).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in similarity.lsh_topk(vecs, qs, n_planes=4, k=5).collect()
    }
    # every approximate hit that IS a true top-5 match carries the exact score
    for key, cos in approx.items():
        if key in brute:
            assert abs(brute[key] - cos) < 1e-9
    recall = len(set(brute) & set(approx)) / len(brute)
    assert recall > 0.05, recall


def test_cosine_topk_matches_numpy(spark):
    import numpy as np

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    rows = vecs.collect()
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    out = similarity.cosine_topk(vecs, vecs.filter(F.col("vec_id") < 5), k=3)
    got = [(r["query_id"], r["vec_id"], r["cosine"], r["rank"]) for r in out.collect()]
    for qid in range(5):
        qi = int(np.where(ids == qid)[0][0])
        sims = m @ m[qi]
        order = sorted(
            ((s, i) for s, i in zip(sims, ids) if i != qid),
            key=lambda t: (-t[0], t[1]),
        )[:3]
        expect = [(qid, i, round(s, 6), r + 1) for r, (s, i) in enumerate(order)]
        assert [g for g in got if g[0] == qid] == expect


def test_recall_probe_matches_manual_recall(spark):
    """recall_probe's numbers must equal recall computed by hand from the
    exact and approximate top-k outputs on the same data."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(vecs, qs, k=5).collect()
    }
    lsh = {
        (r["query_id"], r["vec_id"])
        for r in similarity.lsh_topk(vecs, qs, n_planes=4, k=5).collect()
    }
    ivf = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5
        ).collect()
    }
    sq = {
        (r["query_id"], r["vec_id"])
        for r in similarity.sq_topk(vecs, qs, k=5, rerank=4).collect()
    }
    ivf_sq = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_sq_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5, rerank=4
        ).collect()
    }
    pq = {
        (r["query_id"], r["vec_id"])
        for r in similarity.pq_topk(
            vecs, qs, n_codes=16, k=5, rerank=8
        ).collect()
    }
    ivf_pq = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_pq_topk(
            vecs, qs, n_cells=8, n_probe=2, n_codes=16, k=5, rerank=8
        ).collect()
    }
    got = {
        r["method"]: r
        for r in similarity.recall_probe(
            vecs, qs, n_planes=4, n_cells=8, n_probe=2, k=5, rerank=4,
            pq_codes=16, pq_rerank=8,
        ).collect()
    }
    # all seven rungs of the accuracy/cost ladder (r11 adds the
    # residual-encoding composite; its recall is pinned against the
    # non-residual rung in the dedicated res test)
    assert set(got) == {
        "lsh", "ivf", "sq", "ivf_sq", "pq", "ivf_pq", "ivf_pq_res",
    }
    for name, approx in [
        ("lsh", lsh), ("ivf", ivf), ("sq", sq), ("ivf_sq", ivf_sq),
        ("pq", pq), ("ivf_pq", ivf_pq),
    ]:
        r = got[name]
        assert r["possible"] == len(exact)
        assert r["hits"] == len(exact & approx)
        assert abs(r["recall"] - round(len(exact & approx) / len(exact), 6)) < 1e-9


def test_recall_probe_empty_exact_still_emits_all_methods(spark):
    """recall_probe's scoring layer (r11 optimization round) is ONE
    union + ONE groupBy(method) aggregate instead of seven per-tier
    join+aggregate branches; the 7-row method skeleton must preserve
    the old per-method global agg's guarantee that ZERO exact rows
    still yield one row per method — possible = 0, hits = 0, recall
    NULL (the r07 empty-input contract the nullif guard pinned)."""
    from streamtasks_spark.llmdata import similarity

    vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = {
        r["method"]: r
        for r in similarity.recall_probe(
            vecs, vecs.filter(F.col("vec_id") < 0), pq_codes=16
        ).collect()
    }
    assert set(rows) == {
        "lsh", "ivf", "sq", "ivf_sq", "pq", "ivf_pq", "ivf_pq_res",
    }
    for r in rows.values():
        assert (r["hits"], r["possible"], r["recall"]) == (0, 0, None)


def test_recall_probe_seedless_cells_keeps_ivf_tiers_empty(spark):
    """The shared corpus cell assignment (r11 optimization round: one
    _cell_assign pass feeds all four IVF rungs) must reproduce the
    per-tier assignments' empty-seed behavior bit-exactly: a corpus
    with no ids below n_cells has an EMPTY seeded codebook, so every
    IVF rung returns nothing (hits 0, recall 0.0) while the full-scan
    rungs (lsh, sq, pq — seedable: ids below pq_codes exist) still
    score the corpus."""
    from streamtasks_spark.llmdata import similarity

    vecs = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("vec_id", F.col("vec_id") + 8)  # no ids < n_cells=8
    )
    rows = {
        r["method"]: r
        for r in similarity.recall_probe(
            vecs, vecs.filter(F.col("vec_id") < 18), pq_codes=16
        ).collect()
    }
    assert set(rows) == {
        "lsh", "ivf", "sq", "ivf_sq", "pq", "ivf_pq", "ivf_pq_res",
    }
    possible = {r["possible"] for r in rows.values()}
    assert possible == {rows["lsh"]["possible"]} and possible != {0}
    for name in ("ivf", "ivf_sq", "ivf_pq", "ivf_pq_res"):
        r = rows[name]
        assert (r["hits"], r["recall"]) == (0, 0.0), (name, r)
    # the exhaustive int8 scan needs no seeds: it must still find hits
    assert rows["sq"]["hits"] > 0


# ------------------------------------------------- corpus assembly tier

def test_decontaminate_flags_exact_and_embedded_overlap(spark):
    """An eval doc present in the corpus flags itself; a corpus doc
    embedding an eval 8-gram is flagged; disjoint text is not."""
    from streamtasks_spark.llmdata.pipeline import decontaminate

    w = lambda n, tag: " ".join(f"{tag}{i}" for i in range(n))
    corpus = spark.createDataFrame(
        [
            (1, w(12, "a")),                      # eval doc itself
            (2, w(8, "a") + " " + w(6, "x")),     # contains an eval 8-gram
            (3, w(12, "z")),                      # clean
            (4, w(7, "a") + " " + w(7, "y")),     # only a 7-gram prefix: clean
        ],
        "doc_id long, text string",
    )
    ev = corpus.filter(F.col("doc_id") == 1)
    got = {r["doc_id"]: r["n_shared"] for r in decontaminate(corpus, ev).collect()}
    assert set(got) == {1, 2}
    assert got[1] == 5  # 12 words -> 5 distinct 8-grams, all shared
    assert got[2] == 1


def test_stratified_sample_is_deterministic_k_per_stratum(spark, docs):
    from streamtasks_spark.llmdata.pipeline import stratified_sample

    a = stratified_sample(docs, strata=("source",), k=5).collect()
    b = stratified_sample(docs, strata=("source",), k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per = {}
    for r in a:
        per.setdefault(r["source"], []).append(r["sample_rank"])
    n_sources = docs.select("source").distinct().count()
    assert len(per) == n_sources
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    assert all(len(v) <= 5 for v in per.values())


def test_split_assign_is_stable_and_total(spark, docs):
    """Every doc gets exactly one split; an id's split does not depend
    on what else is in the corpus (the anti-drift property)."""
    from streamtasks_spark.llmdata.pipeline import split_assign

    full = {r["doc_id"]: r["split"] for r in split_assign(docs).collect()}
    assert len(full) == docs.count()
    frac = sum(1 for s in full.values() if s == "train") / len(full)
    assert 0.8 < frac < 0.97  # 90% nominal, 500-doc sample noise
    sub = {
        r["doc_id"]: r["split"]
        for r in split_assign(docs.filter(F.col("doc_id") % 3 == 0)).collect()
    }
    assert all(full[k] == v for k, v in sub.items())


def test_pack_sequences_conserves_tokens_and_bounds(spark, docs):
    """Packing invariants per shard: documents tile the token stream
    exactly (each doc starts where the previous ended), offsets stay
    inside a sequence, and boundary-spanning docs report the right
    sequence range."""
    from streamtasks_spark.llmdata.pipeline import pack_sequences

    L = 256
    rows = pack_sequences(docs, seq_len=L).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["source"], []).append(r)
    assert len(by_shard) > 1
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in shard_rows:
            assert r["start_seq"] == cum // L
            assert r["offset"] == cum % L
            cum += r["n_tokens"]
            assert r["end_seq"] == (cum - 1) // L
            assert r["start_seq"] <= r["end_seq"]


def test_mix_sample_hits_target_composition(spark, docs):
    from streamtasks_spark.llmdata.pipeline import mix_sample

    got = mix_sample(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}, budget=20
    ).collect()
    per = {}
    for r in got:
        per[r["source"]] = per.get(r["source"], 0) + 1
    assert per == {"src0": 10, "src1": 5, "src2": 5}
    again = mix_sample(
        docs, {"src0": 0.5, "src1": 0.25, "src2": 0.25}, budget=20
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_approx_percentile_tracks_exact_quantiles(spark):
    """The 100 TB quantile path (approx_percentile, mergeable sketch)
    must return a value within a small RANK window of the true
    quantile. Value-distance is the wrong yardstick on sparse heavy
    tails (the exact path interpolates across gaps; the sketch returns
    a real data point), so the assertion is positional."""
    from streamtasks_spark.session import read_parquet

    ev = read_parquet(spark, f"{SF_DIR}/events.parquet")
    approx = {
        r["event_type"]: (r["a50"], r["a90"], r["a99"])
        for r in ev.groupBy("event_type").agg(
            F.expr(
                "approx_percentile(value, array(0.5, 0.9, 0.99), 10000)"
            ).alias("a")
        ).select(
            "event_type",
            F.element_at("a", 1).alias("a50"),
            F.element_at("a", 2).alias("a90"),
            F.element_at("a", 3).alias("a99"),
        ).collect()
    }
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(vals) == set(approx)
    for k, sorted_vals in ((k, sorted(v)) for k, v in vals.items()):
        n = len(sorted_vals)
        for p, a in zip((0.5, 0.9, 0.99), approx[k]):
            t = p * (n - 1)
            window = sorted_vals[max(0, int(t) - 2): min(n, int(t) + 4)]
            assert window[0] <= a <= window[-1], (k, p, a, window)


def test_multimodal_stub_stages(spark):
    """Resize halves header dims (ceil) and strides the body bytes;
    feature extraction reports exact byte statistics; both ride the same
    Arrow mapInPandas path as a real kernel would."""
    from streamtasks_spark.llmdata.multimodal import (
        extract_features_stub,
        resize_image_stub,
    )

    rows = [
        (1, bytes([4, 3, 10, 20, 30, 40, 50])),   # 5x4 header, 5-byte body
        (2, bytes([0, 0, 7, 7])),                 # 1x1, duplicate bytes
    ]
    df = spark.createDataFrame(rows, "doc_id long, data binary")

    rz = {r["doc_id"]: r for r in resize_image_stub(df).collect()}
    assert (rz[1]["width"], rz[1]["height"]) == (3, 2)  # ceil(5/2), ceil(4/2)
    assert rz[1]["data_hex"] == bytes([10, 30, 50]).hex()
    assert (rz[2]["width"], rz[2]["height"]) == (1, 1)
    assert rz[2]["data_hex"] == bytes([7]).hex()  # body [7, 7] strided

    ft = {r["doc_id"]: r for r in extract_features_stub(df).collect()}
    assert ft[1]["n_bytes"] == 7 and ft[1]["sum_bytes"] == sum(rows[0][1])
    assert (ft[1]["min_byte"], ft[1]["max_byte"]) == (3, 50)
    assert ft[1]["n_distinct"] == 7
    assert ft[2]["n_distinct"] == 2  # bytes 0,0,7,7 -> {0, 7}


def test_pii_scrub_redacts_and_counts(spark):
    from streamtasks_spark.llmdata.redact import pii_scrub

    rows = [
        (1, "mail a.b-c%d@sub.example.org and x@y.io now"),
        (2, "server 192.168.0.1 peer 10.20.30.40 port 8080"),
        (3, "call +4915512345678 or +1555000"),
        (4, "clean text, no pii at all"),
        # email host contains digits-with-dots: email rule wins (runs first)
        (5, "root@10.0.0.1 stays an email-shaped match"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}

    assert got[1]["scrubbed"] == "mail <EMAIL> and <EMAIL> now"
    assert (got[1]["n_email"], got[1]["n_ip"], got[1]["n_phone"]) == (2, 0, 0)
    assert got[2]["scrubbed"] == "server <IP> peer <IP> port 8080"
    assert got[2]["n_ip"] == 2
    assert got[3]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert got[3]["n_phone"] == 2
    assert got[4]["scrubbed"] == "clean text, no pii at all"
    assert (got[4]["n_email"], got[4]["n_ip"], got[4]["n_phone"]) == (0, 0, 0)
    # "root@10.0.0.1" is NOT email-shaped (no alphabetic TLD), so the
    # email pass leaves it for the ip pass
    assert got[5]["n_email"] == 0
    assert got[5]["n_ip"] == 1
    assert got[5]["scrubbed"] == "root@<IP> stays an email-shaped match"


def test_approx_count_distinct_tracks_exact(spark):
    """The 100 TB distinct-count path (approx_count_distinct, mergeable
    HLL++ sketch — used by events_hourly_stats' user counter) must land
    within its configured relative standard deviation of the exact
    count, per group and in total."""
    from streamtasks_spark.session import read_parquet

    ev = read_parquet(spark, "/root/testdata/sf0.01/events.parquet")
    merged = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.05).alias("approx"),
        )
        .collect()
    )
    assert merged
    for r in merged:
        rel = abs(r["approx"] - r["exact"]) / max(1, r["exact"])
        assert rel < 0.15, (r["event_type"], r["exact"], r["approx"])


def test_substring_dup_spans_matches_python_model(spark):
    """Cross-doc repeated k-gram ratios vs a direct Python set model."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over a sleeping cat today"),
        (3, "completely unrelated text with nothing shared at all"),
        (4, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (5, "short"),  # below k -> excluded
    ]
    k = 16
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.substring_dup_spans(df, k=k, threshold=0.5).collect()
    }

    def grams(t):
        t = re.sub(r"\s+", " ", t.lower().strip())
        return {t[i : i + k] for i in range(len(t) - k + 1)} if len(t) >= k else set()

    gs = {d: grams(t) for d, t in rows}
    from collections import Counter

    freq = Counter(g for s in gs.values() for g in s)
    for d, s in gs.items():
        if not s:
            assert d not in out
            continue
        n_dup = sum(1 for g in s if freq[g] >= 2)
        r = out[d]
        assert r["n_grams"] == len(s)
        assert r["n_dup_grams"] == n_dup
        assert r["dup_ratio"] == pytest.approx(n_dup / len(s), abs=1e-6)
    # exact duplicates flag each other completely
    assert out[1]["dup_ratio"] == 1.0 and out[1]["is_dup_heavy"] == 1
    assert out[4]["dup_ratio"] == 1.0
    # unrelated doc shares nothing
    assert out[3]["n_dup_grams"] == 0 and out[3]["is_dup_heavy"] == 0


def test_token_histogram_buckets_are_integer_exact(spark):
    from streamtasks_spark.llmdata import textstats

    rows = [
        (1, "one"),                      # 1 token  -> bucket 0
        (2, "a b"),                      # 2 tokens -> bucket 1
        (3, "a b c"),                    # 3 tokens -> bucket 1
        (4, "a b c d"),                  # 4 tokens -> bucket 2
        (5, " ".join(["w"] * 7)),        # 7 tokens -> bucket 2
        (6, " ".join(["w"] * 8)),        # 8 tokens -> bucket 3
        (7, ""),                         # 0 tokens -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r for r in textstats.token_histogram(df).collect()}
    assert set(out) == {0, 1, 2, 3}
    assert out[0]["n_docs"] == 1 and out[0]["bucket_lo"] == 1
    assert out[1]["n_docs"] == 2 and out[1]["bucket_lo"] == 2
    assert out[2]["n_docs"] == 2 and out[2]["bucket_lo"] == 4
    assert out[2]["min_tokens"] == 4 and out[2]["max_tokens"] == 7
    assert out[3]["n_docs"] == 1 and out[3]["sum_tokens"] == 8


def test_quality_buckets_partition_the_corpus(spark, docs):
    from streamtasks_spark.llmdata import textstats

    n_docs = docs.count()
    out = sorted(
        textstats.quality_buckets(docs, n_buckets=10).collect(),
        key=lambda r: r["bucket"],
    )
    # every doc lands in exactly one bucket
    assert sum(r["n_docs"] for r in out) == n_docs
    # buckets are ordered, score ranges non-overlapping and increasing
    for a, b in zip(out, out[1:]):
        assert a["bucket"] < b["bucket"]
        assert a["max_score"] <= b["min_score"]
    # boundary binning keeps populations near-equal (not ntile-exact):
    # every bucket within 3x of the ideal decile size
    ideal = n_docs / 10
    for r in out:
        assert r["n_docs"] <= 3 * ideal


def test_corpus_prepare_composes_stage_outputs_exactly(spark, docs):
    """End-to-end pipeline vs its own stages recombined in Python:
    identical drop attribution under quality > dup > contam precedence."""
    from streamtasks_spark.llmdata import pipeline, quality

    ev = docs.filter(F.col("doc_id") % 25 == 7)
    out = pipeline.corpus_prepare(docs, ev).collect()

    q = {
        r["doc_id"]: r["keep"]
        for r in quality.quality_filter(docs).collect()
    }
    comp = dedup.connected_components(
        dedup.dedup_minhash(docs, threshold=0.5)
    ).collect()
    dups = {r["node"] for r in comp if r["node"] != r["component"]}
    contam = {
        r["doc_id"] for r in pipeline.decontaminate(docs, ev).collect()
    }
    sp = {
        r["doc_id"]: r["split"]
        for r in pipeline.split_assign(docs).collect()
    }
    model: dict[tuple, dict] = {}
    for row in docs.select("doc_id", "source", "n_chars").collect():
        d = row["doc_id"]
        if q[d] == 0:
            st = "drop_quality"
        elif d in dups:
            st = "drop_dup"
        elif d in contam:
            st = "drop_contam"
        else:
            st = "keep"
        key = (row["source"], sp[d])
        m = model.setdefault(
            key,
            {"n_docs": 0, "drop_quality": 0, "drop_dup": 0,
             "drop_contam": 0, "keep": 0, "kept_chars": 0},
        )
        m["n_docs"] += 1
        m[st] += 1
        if st == "keep":
            m["kept_chars"] += row["n_chars"]
    assert len(out) == len(model)
    for r in out:
        m = model[(r["source"], r["split"])]
        assert r["n_docs"] == m["n_docs"]
        assert r["n_drop_quality"] == m["drop_quality"]
        assert r["n_drop_dup"] == m["drop_dup"]
        assert r["n_drop_contam"] == m["drop_contam"]
        assert r["n_kept"] == m["keep"]
        assert r["kept_chars"] == m["kept_chars"]


def test_corpus_prepare_default_cap_is_inert_at_test_scale(spark, docs):
    """The default dedup_max_bucket (1000, the corpus-scale hot-bucket
    guard) must not change results where buckets are small — i.e. on
    every oracle dataset. Capped default vs uncapped run, bit-equal."""
    from streamtasks_spark.llmdata import pipeline

    ev = docs.filter(F.col("doc_id") % 25 == 7)
    key = lambda r: (r["source"], r["split"])  # noqa: E731
    capped = sorted(pipeline.corpus_prepare(docs, ev).collect(), key=key)
    uncapped = sorted(
        pipeline.corpus_prepare(docs, ev, dedup_max_bucket=None).collect(),
        key=key,
    )
    assert capped == uncapped


def test_exact_jaccard_pairs_matches_bruteforce(spark, docs):
    """The recall probe's ground-truth tier must be exhaustively exact:
    the postings self-join (with its df>=2 prune) finds exactly the
    pairs a brute-force all-pairs Python scan finds."""
    rows = docs.select("doc_id", "text").collect()
    expected = python_jaccard_pairs(rows, threshold=0.5)
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.exact_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert set(got) == set(expected)
    for p, j in got.items():
        assert abs(expected[p] - j) < 1e-6


def test_exact_jaccard_max_df_drops_boilerplate(spark):
    """max_df caps the postings join fanout: a shingle shared by every
    doc is excluded from the shared-hash counts, so pairs that only
    overlap on the boilerplate no longer reach the threshold."""
    boiler = "copyright legal footer text all rights reserved"
    rows = [(i, f"unique body {i} alpha beta {boiler}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = dedup.exact_jaccard_pairs(df, threshold=0.3)
    capped = dedup.exact_jaccard_pairs(df, threshold=0.3, max_df=3)
    assert full.count() > 0  # boilerplate-driven pairs exist
    assert capped.count() < full.count()


def test_dedup_recall_probe_counts_are_consistent(spark, docs):
    """Probe invariants: verified ⊆ candidates (verification filters),
    verified ⊆ exact (same hashes + formula + threshold), n_exact equals
    the brute-force pair count, and the ratios are the rounded
    quotients."""
    row = dedup.dedup_recall_probe(docs, threshold=0.5).collect()[0]
    rows = docs.select("doc_id", "text").collect()
    expected = python_jaccard_pairs(rows, threshold=0.5)
    assert row["n_exact"] == len(expected)
    assert row["n_verified"] <= row["n_candidates"]
    assert row["n_verified"] <= row["n_exact"]
    assert row["recall"] == round(row["n_verified"] / row["n_exact"], 6)
    assert row["candidate_precision"] == round(
        row["n_verified"] / row["n_candidates"], 6
    )


def test_dedup_recall_probe_zero_guard(spark):
    """No exact pairs at all → ratios are 0.0, not a division error
    (mirrors the ANN probe's empty-tier behavior)."""
    rows = [(1, "alpha beta gamma delta"), (2, "wholly different words here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = dedup.dedup_recall_probe(df, threshold=0.5).collect()[0]
    assert row["n_exact"] == 0
    assert row["recall"] == 0.0
    assert row["candidate_precision"] == 0.0


def test_paragraph_dedup_matches_python_model(spark):
    """Keep-first paragraph dedup over a corpus exercising every edge:
    within-doc repeat, cross-doc normalized duplicate (whitespace AND
    case variants), a fully-duplicate doc (survives with empty text),
    a whitespace-only paragraph (dropped pre-dedup), and a 3-newline
    separator run (ONE boundary, not an empty middle paragraph)."""
    rows = [
        (1, "alpha beta\n\nshared footer\n\nalpha beta"),
        (2, "shared  footer\n\n\ngamma"),
        (3, "SHARED FOOTER"),
        (4, " \t \n\ndelta"),
        (5, "alpha beta\n\nepsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_kept"])
        for r in dedup.paragraph_dedup(df).collect()
    }
    assert got == {
        1: (3, 2, "alpha beta\n\nshared footer"),
        2: (2, 1, "gamma"),
        3: (1, 0, ""),
        4: (1, 1, "delta"),
        5: (2, 1, "epsilon"),
    }


def test_paragraph_dedup_keeps_original_text_of_winner(spark):
    """The SURVIVING paragraph is the winner's ORIGINAL text (not the
    normalized form, and not a later variant's): doc 1's double-spaced
    footer wins over doc 2's single-spaced one because (1, idx) sorts
    first, and the output preserves its exact spacing."""
    rows = [(1, "the  footer"), (2, "the footer\n\nbody")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_kept"], r["text_kept"])
        for r in dedup.paragraph_dedup(df).collect()
    }
    assert got == {1: (1, "the  footer"), 2: (1, "body")}


def test_paragraph_dedup_matches_python_model_random(spark):
    """Randomized semantic check against a pure-python reference (the
    engines agreeing with EACH OTHER is covered by the oracle; this
    pins that they agree on the RIGHT thing): small vocabulary forces
    heavy paragraph collisions, separators vary in run length, docs
    may be empty/whitespace-only."""
    import random
    import re

    vocab = ["alpha beta", "gamma", "delta  five", "ZETA eta", "theta"]
    seps = ["\n\n", "\n\n\n", "\n\n "]
    for seed in (11, 47, 901):
        rng = random.Random(seed)
        rows = []
        for i in range(100):
            k = rng.randrange(0, 5)
            parts = [rng.choice(vocab + ["", "  \t"]) for _ in range(k)]
            rows.append((i, "".join(p + rng.choice(seps) for p in parts)))

        def norm(p):
            return re.sub(r"\s+", " ", p.lower()).strip()

        seen, want = set(), {}
        for i, text in rows:
            paras = [
                (j, p) for j, p in enumerate(re.split(r"\n\n+", text))
                if norm(p) != ""
            ]
            kept = []
            for j, p in paras:
                if norm(p) not in seen:
                    seen.add(norm(p))
                    kept.append(p)
            if paras:
                want[i] = (len(paras), len(kept), "\n\n".join(kept))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_kept"])
            for r in dedup.paragraph_dedup(df).collect()
        }
        assert got == want, seed


def test_paragraph_index_incremental_equals_batch(spark, docs, tmp_path):
    """The 100 TB ingestion contract: paragraph-deduplicating the
    corpus in id-ordered crawl increments through the persistent
    ParagraphIndex yields EXACTLY the one-shot paragraph_dedup output
    on the full corpus — same survivors, same reassembled text."""
    full = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit("\n\nshared footer paragraph"),
            F.when(
                F.col("doc_id") % 7 == 0, F.concat(F.lit("\n\n"), F.col("text"))
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    expect = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text_kept"])
        for r in dedup.paragraph_dedup(full).collect()
    }
    idx = dedup.ParagraphIndex(str(tmp_path / "para_index"))
    got = {}
    bounds = [(0, 30), (30, 60), (60, 10_000)]
    for lo, hi in bounds:  # id-ordered increments
        batch = full.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        for r in idx.ingest(batch).collect():
            assert r["doc_id"] not in got  # each doc reported exactly once
            got[r["doc_id"]] = (r["n_paras"], r["n_kept"], r["text_kept"])
    assert got == expect


def test_paragraph_index_replay_is_idempotent(spark, tmp_path):
    """Re-ingesting a batch (the crash-replay case) reports zero
    survivors — everything is history — and the duplicate hash rows it
    appends change nothing, before or after compaction."""
    rows = [(1, "alpha\n\nbeta"), (2, "beta\n\ngamma")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = dedup.ParagraphIndex(str(tmp_path / "pidx"))
    first = {
        r["doc_id"]: (r["n_kept"], r["text_kept"])
        for r in idx.ingest(df).collect()
    }
    assert first == {1: (2, "alpha\n\nbeta"), 2: (1, "gamma")}
    replay = {r["doc_id"]: r["n_kept"] for r in idx.ingest(df).collect()}
    assert replay == {1: 0, 2: 0}
    idx.compact(spark)
    fresh = spark.createDataFrame(
        [(3, "gamma\n\ndelta")], "doc_id long, text string"
    )
    post = {r["doc_id"]: (r["n_kept"], r["text_kept"]) for r in idx.ingest(fresh).collect()}
    assert post == {3: (1, "delta")}


def test_minhash_index_incremental_equals_batch(spark, docs, tmp_path):
    """The 100 TB ingestion contract: deduplicating the corpus in
    arrival batches through the persistent MinHashIndex yields EXACTLY
    the pairs the one-shot dedup_minhash finds on the full corpus —
    same pair set, same exact-Jaccard values."""
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_minhash(docs, threshold=0.5).collect()
    }
    idx = dedup.MinHashIndex(str(tmp_path / "mh_index"), threshold=0.5)
    got = {}
    for part in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == part)
        for r in idx.ingest(batch).collect():
            key = (r["doc_a"], r["doc_b"])
            assert key not in got  # each pair emitted exactly once
            got[key] = r["jaccard"]
    assert got == full


def test_minhash_index_first_ingest_is_self_dedup(spark, tmp_path):
    """Empty index: first ingest behaves exactly like batch minhash on
    that batch alone, and the index then persists its sketches."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog tonight"),
        (3, "completely unrelated text about database systems design"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = dedup.MinHashIndex(str(tmp_path / "idx"), threshold=0.5)
    out = idx.ingest(df).collect()
    batch = dedup.dedup_minhash(df, threshold=0.5).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} == {
        (r["doc_a"], r["doc_b"]) for r in batch
    }
    # second ingest: a near-dup of doc 1 pairs across the batch seam
    df2 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today now")],
        "doc_id long, text string",
    )
    out2 = {(r["doc_a"], r["doc_b"]) for r in idx.ingest(df2).collect()}
    assert any(a in (1, 2) and b == 10 for a, b in out2)


def test_ivf_index_matches_ivf_topk(spark, tmp_path):
    """A one-shot IvfIndex build answers queries identically to the
    in-plan ivf_topk (same codebook seeding, same rerank)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 10)
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5
        ).collect()
    }
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    idx.ingest(vecs)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in idx.query(qs, k=5).collect()
    }
    assert got == want


def test_ivf_index_incremental_build_and_pruned_scan(spark, tmp_path):
    """Index built in two increments (codebook frozen by the first)
    still answers like the one-shot plan, and the probed-cell partition
    filter reaches the parquet scan (reads only probed directories)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 10)
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    # first batch holds the codebook seed ids (< n_cells), as a sampled
    # training slice would
    idx.ingest(vecs.filter(F.col("vec_id") < 250))
    idx.ingest(vecs.filter(F.col("vec_id") >= 250))
    out = idx.query(qs, k=5)
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in out.collect()
    }
    assert got == want
    # partition pruning: a small query batch probes few cells, and the
    # cells scan must list ONLY those cells' directories
    import re as _re

    narrow = idx.query(qs.filter(F.col("vec_id") < 2), k=5)
    narrow.collect()
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    m = _re.search(r"PartitionFilters: \[[^\]]*IN \(([^)]*)\)", plan)
    assert m, f"no partition IN-filter reached the cells scan:\n{plan[:2000]}"
    probed_cells = {c.strip() for c in m.group(1).split(",")}
    assert len(probed_cells) <= 2 * 2  # n_queries * n_probe bound
    assert len(probed_cells) < 8  # strictly fewer than the 8 cell dirs


def test_train_centroids_reduces_inertia_deterministically(spark):
    """Lloyd iterations must monotonically improve the codebook: total
    within-cell cosine distance (1 - cos to assigned centroid) after
    training is strictly lower than under the raw lowest-id seeding,
    and two training runs produce bit-identical centroids (integer
    micro-unit sums make the mean order-independent)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")

    def inertia(cents) -> float:
        v = similarity._with_norm(
            vecs.select("vec_id", "embedding"), "embedding"
        ).select("vec_id", "__v", "__nrm")
        score = (
            F.expr(similarity._dot("__v", "__cv"))
            / (F.col("__nrm") * F.col("__cn"))
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("vec_id").orderBy(
            F.col("__score").desc(), F.col("__cell").asc()
        )
        best = (
            v.crossJoin(cents)
            .withColumn("__score", score)
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
        )
        return best.agg(F.sum(F.lit(1.0) - F.col("__score"))).collect()[0][0]

    seed = similarity._with_norm(
        vecs.filter(F.col("vec_id") < 8).select("vec_id", "embedding"),
        "embedding",
    ).select(
        F.col("vec_id").alias("__cell"),
        F.col("__v").alias("__cv"),
        F.col("__nrm").alias("__cn"),
    )
    trained = similarity.train_centroids(vecs, n_cells=8, n_iters=3)
    assert inertia(trained) < inertia(seed)

    again = similarity.train_centroids(vecs, n_cells=8, n_iters=3)
    a = sorted(map(tuple, trained.select("__cell", "__cv").collect()))
    b = sorted(map(tuple, again.select("__cell", "__cv").collect()))
    assert [(c, tuple(v)) for c, v in a] == [(c, tuple(v)) for c, v in b]


def test_ivf_index_with_trained_codebook(spark, tmp_path):
    """IvfIndex seeded with a train_centroids codebook answers exactly
    like ivf_topk given the same trained centroids."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 10)
    cents = similarity.train_centroids(vecs, n_cells=8, n_iters=2)
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    idx.ingest(vecs, codebook=cents)
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in similarity.ivf_topk(
            vecs, qs, n_probe=2, k=5, centroids=cents
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in idx.query(qs, k=5).collect()
    }
    assert got == want


def test_minhash_index_compaction_preserves_results(spark, docs, tmp_path):
    """compact() collapses the per-ingest small files without changing
    any future ingest's output: a post-compaction ingest finds exactly
    the pairs it would have found against the uncompacted index."""
    import glob

    idx = dedup.MinHashIndex(str(tmp_path / "mh"), threshold=0.5)
    for part in range(2):
        idx.ingest(docs.filter(F.col("doc_id") % 3 == part))
    before = len(
        glob.glob(str(tmp_path / "mh" / "bands" / "seg_*" / "*.parquet"))
    )
    uncompacted = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.dedup_minhash(docs, threshold=0.5).collect()
    }
    idx.compact(spark, files_per_table=2)
    after = len(
        glob.glob(str(tmp_path / "mh" / "bands" / "seg_*" / "*.parquet"))
    )
    assert after < before
    got = {}
    for r in idx.ingest(docs.filter(F.col("doc_id") % 3 == 2)).collect():
        got[(r["doc_a"], r["doc_b"])] = r["jaccard"]
    # final batch's pairs = full-corpus pairs involving a part-2 doc
    expect = {
        p: j for p, j in uncompacted.items()
        if p[0] % 3 == 2 or p[1] % 3 == 2
    }
    assert got == expect


def test_ivf_index_compaction_preserves_results_and_pruning(spark, tmp_path):
    """Compacting the cells table collapses per-ingest part files while
    keeping the __cell partition layout (pruning still applies) and the
    exact query results."""
    import glob

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 10)
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    idx.ingest(vecs.filter(F.col("vec_id") < 250))
    idx.ingest(vecs.filter(F.col("vec_id") >= 250))
    before_res = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in idx.query(qs, k=5).collect()
    }
    n_files = lambda: len(  # noqa: E731
        glob.glob(
            str(tmp_path / "ivf" / "cells" / "seg_*" / "__cell=*" / "*.parquet")
        )
    )
    before_files = n_files()
    idx.compact(spark)
    assert n_files() < before_files
    # partition dirs survive the rewrite (inside the live segment)
    assert glob.glob(str(tmp_path / "ivf" / "cells" / "seg_*" / "__cell=*"))
    after_res = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"])
        for r in idx.query(qs, k=5).collect()
    }
    assert after_res == before_res


def test_snapshot_read_missing_vs_corrupt(spark, tmp_path):
    """snapshot_read maps only 'dataset not there yet' to None (missing
    path, empty dir); an unreadable dataset must RAISE — returning None
    would make the indexes silently treat corrupt history as empty and
    emit wrong results (ADVICE r04)."""
    import os

    import pytest

    from streamtasks_spark.llmdata.dedup import snapshot_read

    assert snapshot_read(spark, str(tmp_path / "nope")) is None
    os.makedirs(tmp_path / "empty")
    assert snapshot_read(spark, str(tmp_path / "empty")) is None
    os.makedirs(tmp_path / "corrupt")
    (tmp_path / "corrupt" / "part-0000.parquet").write_bytes(
        b"garbage not parquet at all" * 10
    )
    with pytest.raises(Exception):
        snapshot_read(spark, str(tmp_path / "corrupt"))


def test_ivf_index_default_seed_matches_ivf_topk_filter(spark, tmp_path):
    """The first-ingest default codebook uses the identical
    id_col < n_cells filter as ivf_topk's default seeding — not the
    batch's n_cells lowest ids (divergent for non-zero-based ids,
    ADVICE r04). With ids starting at 100 and n_cells=8 the seed set is
    EMPTY — the ingest must fail loudly instead of silently seeding 8
    arbitrary vectors (old behavior) or writing an index that answers
    nothing (empty-codebook behavior)."""
    import pytest

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").withColumn(
        "vec_id", F.col("vec_id") + 100
    )
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    with pytest.raises(ValueError, match="empty codebook"):
        idx.ingest(vecs)
    # an explicitly supplied EMPTY codebook must fail the same way
    # (checked post-write against the materialized file, so the
    # caller's plan is not re-evaluated)
    empty_cb = vecs.sparkSession.createDataFrame(
        [], "__cell long, __cv array<double>, __cn double"
    )
    with pytest.raises(ValueError, match="empty codebook"):
        idx.ingest(vecs, codebook=empty_cb)
    # the failed attempts unwrote their codebook: a valid ingest on the
    # same path now succeeds and serves queries
    ok = vecs.withColumn("vec_id", F.col("vec_id") - 100)
    idx.ingest(ok)
    assert idx.query(ok.filter(F.col("vec_id") < 3), k=2).count() > 0


def test_ivf_pq_index_matches_ivf_pq_topk(spark, tmp_path):
    """A one-shot IvfPqIndex build (r10) answers queries identically
    to the in-plan ivf_pq_topk — same coarse seeding, same PQ
    codebook training, same integer ADC candidate order, same exact
    re-rank — and the probed cells' scan payload is CODES ONLY (no
    raw vector column in the cells table: the 32× compression is the
    index's point, raw floats live in the side table the re-rank
    fetches from)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 10)
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"], r["approx"])
        for r in similarity.ivf_pq_topk(
            vecs, qs, n_cells=8, n_probe=2, m_sub=8, n_codes=8, k=5
        ).collect()
    }
    idx = similarity.IvfPqIndex(
        str(tmp_path / "ivfpq"), n_cells=8, n_probe=2, m_sub=8, n_codes=8
    )
    idx.ingest(vecs)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"], r["approx"])
        for r in idx.query(qs, k=5).collect()
    }
    assert got == want
    # compression contract: codes table stores no float vectors
    cells = spark.read.option("basePath", idx.cells_path).parquet(
        idx.cells_path
    )
    assert sorted(cells.columns) == ["__cell", "__codes", "vec_id"]


@pytest.mark.slow  # slow tier (pytest.ini, r12)
def test_ivf_pq_index_incremental_reload_and_pruning(spark, tmp_path):
    """Index built in two increments under a FROZEN train_pq_codebooks
    codebook (the production shape — trained once on the corpus, fed
    to the first ingest) and queried through a FRESH object (codebooks
    reloaded from parquet) answers identically to the one-shot plan
    fed the same codebook; the probed-cell partition filter reaches
    BOTH the codes scan and the raw-vector side-table scan; compaction
    preserves results and layout."""
    import glob
    import re as _re

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    qs = vecs.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivfpq")
    kw = dict(n_cells=8, n_probe=2, m_sub=8, n_codes=8)
    cb = similarity.train_pq_codebooks(vecs, m_sub=8, n_codes=8)
    idx = similarity.IvfPqIndex(path, **kw)
    idx.ingest(vecs.filter(F.col("vec_id") < 250), pq_codebooks=cb)
    idx.ingest(vecs.filter(F.col("vec_id") >= 250))
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"], r["approx"])
        for r in similarity.ivf_pq_topk(
            vecs, qs, k=5, _cb=cb, **kw
        ).collect()
    }
    reloaded = similarity.IvfPqIndex(path, **kw)  # fresh object
    out = reloaded.query(qs, k=5)
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"], r["approx"])
        for r in out.collect()
    }
    assert got == want
    # partition pruning reaches both scans: the executed plan carries
    # an IN partition filter per parquet relation, each bounded by the
    # probed-cell count
    narrow = reloaded.query(qs.filter(F.col("vec_id") < 2), k=5)
    narrow.collect()
    plan = narrow._jdf.queryExecution().executedPlan().toString()
    filters = _re.findall(r"PartitionFilters: \[[^\]]*IN \(([^)]*)\)", plan)
    assert len(filters) >= 2, (
        f"probed-cell filter missing from a scan:\n{plan[:2000]}"
    )
    for grp in filters:
        cells = {c.strip() for c in grp.split(",")}
        assert len(cells) <= 2 * 2  # n_queries * n_probe bound
        assert len(cells) < 8
    # compaction: fewer files, same partition dirs (inside the live
    # manifest segments since r11), same answers
    n_files = lambda sub: len(  # noqa: E731
        glob.glob(f"{path}/{sub}/seg_*/__cell=*/*.parquet")
    )
    before = n_files("cells") + n_files("vectors")
    reloaded.compact(spark)
    assert n_files("cells") + n_files("vectors") < before
    assert glob.glob(f"{path}/cells/seg_*/__cell=*")
    after = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["cosine"], r["approx"])
        for r in reloaded.query(qs, k=5).collect()
    }
    assert after == want


def test_ivf_pq_index_failed_first_ingest_unwinds(spark, tmp_path):
    """A first ingest that cannot seed either codebook fails loudly
    AND unwrites what it wrote, so a later valid ingest on the same
    path succeeds (the IvfIndex empty-codebook contract carried to
    both codebooks)."""
    import pytest

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").withColumn(
        "vec_id", F.col("vec_id") + 100
    )
    idx = similarity.IvfPqIndex(str(tmp_path / "ivfpq"), n_cells=8)
    with pytest.raises(ValueError, match="empty coarse codebook"):
        idx.ingest(vecs)
    # coarse codebook ok (supplied) but PQ seeding impossible: the
    # supplied codebook must be unwritten too
    cents = similarity.train_centroids(
        vecs.withColumn("vec_id", F.col("vec_id") - 100),
        n_cells=8, n_iters=1,
    )
    with pytest.raises(ValueError, match="could not train PQ"):
        idx.ingest(vecs, codebook=cents)
    ok = vecs.withColumn("vec_id", F.col("vec_id") - 100)
    idx.ingest(ok)
    assert idx.query(ok.filter(F.col("vec_id") < 3), k=2).count() > 0


def test_dedup_recall_probe_sampling_is_systematic(spark, docs):
    """sample_mod=m must equal running the probe on the id%m==0 slice
    (engine-reproducible systematic sampling — not partitioning-
    dependent Bernoulli), and sample_mod=None must stay the exhaustive
    default the driver certifies."""
    from streamtasks_spark.llmdata import dedup

    sliced = docs.filter(F.col("doc_id") % 3 == 0)
    a = dedup.dedup_recall_probe(docs, sample_mod=3).collect()[0]
    b = dedup.dedup_recall_probe(sliced).collect()[0]
    assert a.asDict() == b.asDict()
    full = dedup.dedup_recall_probe(docs).collect()[0]
    assert full["n_exact"] >= a["n_exact"]


def test_banded_near_dup_matches_oracle(spark):
    """The banded SimHash path (bands>1, the recall-recovery
    configuration SCALE.md measures at scale) must stay bit-exact
    against its DuckDB oracle twin across several (bands, planes)
    geometries — the same cross-engine gate the driver applies to the
    bands=1 default."""
    import duckdb

    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{sf_dir}/embeddings.parquet'"
    )
    for bands, planes in ((3, 2), (4, 3), (2, 5)):
        sdf = (
            similarity.embedding_near_dup(
                vecs, n_planes=planes, threshold=0.4, bands=bands
            )
            .toPandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        odf = (
            con.execute(
                similarity.oracle_embedding_near_dup_sql(
                    n_planes=planes, threshold=0.4, bands=bands
                )
            )
            .df()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        assert len(sdf) == len(odf), (bands, planes, len(sdf), len(odf))
        assert (
            sdf[["vec_a", "vec_b"]].values == odf[["vec_a", "vec_b"]].values
        ).all(), (bands, planes)
        assert (sdf["cosine"] == odf["cosine"]).all(), (bands, planes)


def test_dim_mismatch_raises_instead_of_silently_diverging(spark):
    """r07 --dim fuzz finding: hyperplanes/codebooks are a function of
    the configured dim, and a mismatch with the data's real
    dimensionality used to DIVERGE silently (Spark zip_with
    NULL-extends → buckets collapse; DuckDB list-indexing NULL-skips →
    truncated dots) — 15 cross-engine FAILs at dim 3. Every
    plane/codebook entry point now raises on the first mismatched
    vector instead.

    The assertion pins the guard MESSAGE, not the wrapper type: when
    AQE happens to materialize two failing stages concurrently, Spark
    surfaces STAGE_MATERIALIZATION_MULTIPLE_FAILURES (a plain
    SparkException) instead of SparkRuntimeException — a scheduling
    race that made a type-pinned version of this test flaky in
    full-suite runs while green standalone."""
    from streamtasks_spark.llmdata import similarity

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, -1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    qs = vecs.filter(F.col("vec_id") < 3)

    for build in (
        lambda: similarity.lsh_topk(vecs, qs, n_planes=4, k=5),  # dim=64
        lambda: similarity.embedding_near_dup(vecs, n_planes=4),
        lambda: similarity.train_centroids(vecs, n_cells=4, expect_dim=64),
        # the data-derived ops are dim-agnostic; guard_dim is the
        # call-site declaration of a fixed-dim oracle coupling
        lambda: similarity.cosine_topk(
            similarity.guard_dim(vecs, "embedding", 64, "t"), qs, k=5
        ),
    ):
        with pytest.raises(Exception, match="configured dim 64"):
            build().collect()


def test_guard_dim_passes_null_vectors_through(spark):
    """NULL embeddings are legitimate input (dropped by _with_norm,
    mirrored by the oracles' dot(v,v) > 0 predicate). guard_dim must
    not misroute them into raise_error — F.size(NULL) is NULL, so
    without an explicit isNull pass-through the when-condition fails
    into the error branch and a correctly-dimensioned corpus with one
    NULL row spuriously ERRs while the DuckDB oracle succeeds."""
    from streamtasks_spark.llmdata import similarity

    vecs = spark.createDataFrame(
        [(0, [1.0, 0.0, 2.0]), (1, None), (2, [0.5, -1.0, 3.0])],
        "vec_id long, embedding array<float>",
    )
    guarded = similarity.guard_dim(vecs, "embedding", 3, "t")
    assert guarded.count() == 3  # NULL row survives the guard untouched
    out = similarity.cosine_topk(guarded, guarded.filter("vec_id = 0"), k=2)
    # downstream _with_norm drops the NULL row (and self is excluded),
    # so query 0's only neighbor is vector 2 — no raise anywhere
    assert {r.vec_id for r in out.collect()} == {2}


def test_lsh_matches_oracle_at_nondefault_dim(spark):
    """The dim machinery is general, not a 64 special case: at dim 16,
    Spark lsh_topk and the dim-16 DuckDB oracle agree bit-for-bit (the
    guard above only forbids MISMATCHED configs)."""
    import duckdb

    from streamtasks_spark.llmdata import similarity

    rows = [
        (i, [round(((i * 37 + j * 11) % 19 - 9) / 9.0, 3) for j in range(16)])
        for i in range(40)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = vecs.filter(F.col("vec_id") < 8)
    sdf = (
        similarity.lsh_topk(vecs, qs, dim=16, n_planes=4, k=5)
        .toPandas()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT "
        "UNNEST(range(40)) AS vec_id, NULL::FLOAT[] AS embedding"
    )
    con.execute("DELETE FROM embeddings")
    for i, v in rows:
        con.execute("INSERT INTO embeddings VALUES (?, ?)", [i, v])
    odf = (
        con.execute(
            similarity.oracle_lsh_topk_sql(
                dim=16, n_planes=4, k=5, query_filter="vec_id < 8"
            )
        )
        .df()
        .sort_values(["query_id", "vec_id"])
        .reset_index(drop=True)
    )
    assert len(sdf) == len(odf) > 0
    assert (sdf["query_id"].values == odf["query_id"].values).all()
    assert (sdf["vec_id"].values == odf["vec_id"].values).all()
    assert (sdf["cosine"].values == odf["cosine"].values).all()


def test_semantic_dedup_matches_oracle_across_params(spark):
    """semantic_dedup (r07): the full pipeline — deterministic k-means,
    literal-argmax assignment, within-cluster lowest-id domination —
    must stay bit-exact against its DuckDB twin across several
    (n_cells, n_iters, threshold) geometries, not just the entry
    default (a param-hardcoding bug in either twin fails here)."""
    import duckdb

    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{sf_dir}/embeddings.parquet'"
    )
    for n_cells, n_iters, thr in ((8, 2, 0.35), (4, 1, 0.45), (6, 3, 0.3)):
        sdf = (
            similarity.semantic_dedup(
                vecs, n_cells=n_cells, n_iters=n_iters, threshold=thr
            )
            .toPandas()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        odf = (
            con.execute(
                similarity.oracle_semantic_dedup_sql(
                    n_cells=n_cells, n_iters=n_iters, threshold=thr
                )
            )
            .df()
            .sort_values("vec_id")
            .reset_index(drop=True)
        )
        assert len(sdf) == len(odf), (n_cells, n_iters, thr)
        assert (sdf.values == odf.values).all(), (n_cells, n_iters, thr)
        # the keep rule must actually drop something at these
        # thresholds on this data, or the equality proves nothing
        assert (~sdf["keep"]).any(), (n_cells, n_iters, thr)


def test_semantic_dedup_keeps_one_representative_per_group(spark):
    """The lowest-id-wins rule keeps ≥1 member of every duplicate
    group: a cluster's minimum id has no lower-id mate, so per cell
    the lowest id always survives; and every dropped vector has a KEPT
    lower-id cluster-mate at cosine ≥ threshold (dropping a vector
    because of another DROPPED one would be greedy-chain semantics —
    not this op's contract)."""
    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = similarity.semantic_dedup(vecs).toPandas()
    # per-cell minimum id is always kept
    mins = out.groupby("cell")["vec_id"].min()
    kept = set(out[out["keep"]]["vec_id"])
    assert set(mins).issubset(kept)
    # domination is by ANY lower-id mate, kept or not — so at minimum
    # every cell with a drop must also keep at least one row
    cells_with_drop = set(out[~out["keep"]]["cell"])
    cells_with_keep = set(out[out["keep"]]["cell"])
    assert cells_with_drop.issubset(cells_with_keep)


def test_semantic_dedup_max_cell_guard(spark):
    """max_cell (r08, the dedup_minhash max_bucket pattern): a cap at
    or above the largest cell population is a no-op (bit-identical to
    exact semantics), and a cap below a hot cell's population excludes
    that cell from PAIRING only — its vectors all come back keep=true
    (under-dropped, never mis-dropped) while cells within the cap keep
    their exact verdicts."""
    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = (
        similarity.semantic_dedup(vecs)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    pops = exact.groupby("cell").size()
    # cap ≥ max population: bit-identical to the uncapped op
    nop = (
        similarity.semantic_dedup(vecs, max_cell=int(pops.max()))
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (nop.values == exact.values).all()
    # cap below the hottest cell: that cell is pairing-excluded
    hot = pops.idxmax()
    cap = int(pops.max()) - 1
    assert cap >= 1 and (~exact[exact["cell"] == hot]["keep"]).any(), (
        "fixture must actually drop something in the hot cell"
    )
    capped = (
        similarity.semantic_dedup(vecs, max_cell=cap)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert capped[capped["cell"] == hot]["keep"].all()
    # cells within the cap keep their exact verdicts
    ok_cells = set(pops[pops <= cap].index)
    a = exact[exact["cell"].isin(ok_cells)]
    b = capped[capped["cell"].isin(ok_cells)]
    assert (a.values == b.values).all()
    # row universe unchanged: the cap never removes output rows
    assert list(capped["vec_id"]) == list(exact["vec_id"])


def test_tfidf_topk_matches_oracle_across_k(spark):
    """tfidf_topk (r07): bit-exact vs DuckDB at several k — the
    raw-ratio idf keeps every score an exact small-integer ratio, so
    rank order (score desc, token asc) cannot diverge cross-engine."""
    import duckdb

    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for k in (1, 5, 12):
        sdf = (
            textstats.tfidf_topk(docs, k=k)
            .toPandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        odf = (
            con.execute(textstats.oracle_tfidf_topk_sql(k=k))
            .df()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        assert len(sdf) == len(odf), k
        assert (sdf.values == odf.values).all(), k
        assert (sdf["rank"] <= k).all()
        # rank must be dense 1..n per doc
        g = sdf.groupby("doc_id")["rank"]
        assert (g.min() == 1).all() and (g.max() == g.count()).all()


def test_bm25_topk_matches_oracle_across_geometries(spark):
    """bm25_topk (r09): bit-exact vs DuckDB across (terms, k1, b, k)
    geometries — the shared score fragment plus floored-integer scaled
    sums make the per-doc score order-independent, so partial-agg
    combine order cannot flip a rank."""
    import duckdb

    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for terms, k1, b, k in (
        (("spark", "hash"), 1.2, 0.75, 10),
        (("spark", "hash", "window", "merge"), 1.2, 0.75, 15),
        (("table",), 2.0, 0.0, 5),       # b=0: no length normalization
        (("value", "row", "scan"), 0.9, 1.0, 25),  # b=1: full dl scaling
    ):
        sdf = (
            textstats.bm25_topk(docs, terms=terms, k1=k1, b=b, k=k)
            .toPandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        odf = (
            con.execute(
                textstats.oracle_bm25_topk_sql(terms=terms, k1=k1, b=b, k=k)
            )
            .df()
            .sort_values("rank")
            .reset_index(drop=True)
        )
        assert len(sdf) == len(odf), (terms, k)
        assert list(sdf.columns) == list(odf.columns)
        assert (sdf.values == odf.values).all(), (terms, k1, b, k)
        assert (sdf["rank"] <= k).all()
        assert (sdf["n_terms_matched"] >= 1).all()


def test_bm25_search_matches_oracle_and_single_bag(spark):
    """bm25_search (r09): bit-exact vs DuckDB for a multi-bag query
    table; a single-bag query table reproduces bm25_topk's scores
    exactly (the two plans differ — semi-join-pruned shuffle vs
    literal-bag lambda — but the scoring math is shared)."""
    import duckdb

    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    bags = {0: ("spark", "hash"), 1: ("window", "merge", "sort"),
            2: ("table", "scan", "value", "row")}
    qdf = spark.createDataFrame(
        [(k, list(v)) for k, v in bags.items()],
        "query_id long, terms array<string>",
    )
    sdf = (
        textstats.bm25_search(docs, qdf, k=10)
        .toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    odf = (
        con.execute(textstats.oracle_bm25_search_sql(query_bags=bags, k=10))
        .df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    )
    assert len(sdf) == len(odf) > 0
    assert (sdf.values == odf.values).all()
    # single-bag equivalence with bm25_topk (per-doc scores, same k)
    one = spark.createDataFrame(
        [(9, ["spark", "hash", "window", "merge"])],
        "query_id long, terms array<string>",
    )
    via_search = {
        (r["doc_id"], r["rank"]): (r["n_terms_matched"], r["bm25"])
        for r in textstats.bm25_search(docs, one, k=15).collect()
    }
    via_topk = {
        (r["doc_id"], r["rank"]): (r["n_terms_matched"], r["bm25"])
        for r in textstats.bm25_topk(
            docs, terms=("spark", "hash", "window", "merge"), k=15
        ).collect()
    }
    assert via_search == via_topk


def test_hll_corrected_expr_engines_agree(spark):
    """The HLL range-correction fragment (r10) is the one place a
    transcendental (ln) enters the sketch family. Sweep EVERY
    reachable small-range input — for each geometry, all m possible
    empty-register counts V — plus branch-boundary and large-range
    probes, and assert Spark (JVM Math.log) and DuckDB (C libm)
    agree at the 6-decimal rounding the ops apply."""
    import duckdb

    from streamtasks_spark.llmdata.textstats import _hll_corrected_expr

    con = duckdb.connect()
    for p in (4, 5, 7, 8):
        m = 1 << p
        # est below 2.5m -> the linear-counting branch fires for every
        # V in 1..m; then the 2.5m boundary from both sides, the
        # zeros=0 raw path, and the 48-bit large-range branch
        rows = [(float(m), m - v) for v in range(1, m + 1)]
        rows += [
            (2.5 * m, m - 1),
            (2.5 * m + 1e-6, m - 1),
            (3.0 * float(m), m),
            ((1 << 48) / 30.0 + 1.0, m),
            (0.9 * float(1 << 48), m),
        ]
        idx = [(i, e, v) for i, (e, v) in enumerate(rows)]
        sdf = spark.createDataFrame(
            idx, "__i int, __est double, n_buckets_hit int"
        )
        expr = _hll_corrected_expr("__est", "n_buckets_hit", m)
        got = [
            r["c"]
            for r in sdf.select(
                "__i", F.round(F.expr(expr), 6).alias("c")
            ).orderBy("__i").collect()
        ]
        want = [
            con.execute(
                f"SELECT round({expr}, 6) FROM "
                "(SELECT ? AS __est, ? AS n_buckets_hit)",
                [e, v],
            ).fetchone()[0]
            for e, v in rows
        ]
        assert got == want, p


def test_approx_distinct_hll_matches_oracle_and_error_bound(spark):
    """approx_distinct_hll (r09): bit-exact vs DuckDB across (n, p)
    geometries; in the proper regime (universe >> m) the raw
    estimator's measured error sits within ~3 standard errors of
    1.04/sqrt(m); duplicates never move the estimate (max is
    idempotent: doubling the corpus rows changes nothing); p out of
    range raises."""
    import duckdb

    import pytest as _pytest

    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for n, p in ((3, 8), (2, 7), (1, 4)):
        sdf = textstats.approx_distinct_hll(docs, n=n, p=p).toPandas()
        odf = con.execute(
            textstats.oracle_approx_distinct_hll_sql(n=n, p=p)
        ).df()
        assert len(sdf) == len(odf) == 1, (n, p)
        assert (sdf.values == odf.values).all(), (n, p)
    r = textstats.approx_distinct_hll(docs, n=3, p=8).collect()[0]
    m = r["m"]
    assert r["exact_distinct"] > 20 * m  # proper raw-estimator regime
    assert abs(r["rel_error"]) < 3 * 1.04 / (m ** 0.5)
    # duplicate-invariance: the register file is a max, so repeating
    # every document changes nothing but the exact side's work
    doubled = docs.unionByName(docs)
    d = textstats.approx_distinct_hll(doubled, n=3, p=8).collect()[0]
    assert d["raw_estimate"] == r["raw_estimate"]
    assert d["exact_distinct"] == r["exact_distinct"]
    with _pytest.raises(ValueError, match="p must be"):
        textstats.approx_distinct_hll(docs, p=1)


def test_heavy_hitters_cms_matches_oracle_and_guarantees(spark):
    """heavy_hitters_cms (r09): bit-exact vs DuckDB across sketch
    geometries INCLUDING a deliberately tiny sketch that forces
    collisions; the CMS guarantees hold visibly — est >= true always,
    and every token whose TRUE count reaches the phi bar is reported
    (no false negatives)."""
    import duckdb

    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    saw_overestimate = False
    for width, depth, phi in ((256, 4, 0.005), (16, 2, 0.005),
                              (64, 5, 0.01)):
        sdf = (
            textstats.heavy_hitters_cms(
                docs, width=width, depth=depth, phi=phi
            )
            .toPandas().sort_values("token").reset_index(drop=True)
        )
        odf = (
            con.execute(textstats.oracle_heavy_hitters_cms_sql(
                width=width, depth=depth, phi=phi
            ))
            .df().sort_values("token").reset_index(drop=True)
        )
        assert len(sdf) == len(odf) > 0, (width, depth)
        assert (sdf.values == odf.values).all(), (width, depth)
        assert (sdf["overestimate"] >= 0).all()
        saw_overestimate |= bool((sdf["overestimate"] > 0).any())
        # no false negatives: every true-heavy token is reported
        true_counts = con.execute(f"""
            WITH t AS (SELECT unnest({textstats.tokens_expr('text', 'duck')})
                       AS __t FROM documents)
            SELECT __t, count(*) AS c FROM t GROUP BY __t
        """).fetchall()
        total = sum(c for _, c in true_counts)
        heavy = {t for t, c in true_counts if c * 1_000_000
                 >= total * int(round(phi * 1_000_000))}
        assert heavy <= set(sdf["token"]), (width, depth)
    assert saw_overestimate  # the tiny sketch really collided


def test_bm25_frozen_stats_reproduce_corpus_scores(spark):
    """bm25_score_frozen over bm25_stats of the SAME corpus equals
    bm25_topk's (n_terms_matched, bm25) on every top-k row — the
    frozen split changes where the stats come from (literals vs the
    plan), never the arithmetic; and a doc unseen by the frozen stats
    still scores (its terms' df frozen at reference-corpus values,
    production quantizer semantics)."""
    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = ("spark", "hash", "window", "merge")
    stats = textstats.bm25_stats(docs, terms=terms)
    assert stats[1] == docs.count() and set(stats[0]) <= set(terms)
    frozen = {
        r["doc_id"]: (r["n_terms_matched"], r["bm25"])
        for r in textstats.bm25_score_frozen(
            docs, stats, terms=terms
        ).collect()
    }
    for r in textstats.bm25_topk(docs, terms=terms, k=15).collect():
        assert frozen[r["doc_id"]] == (r["n_terms_matched"], r["bm25"]), r
    # an unseen doc scores under the frozen stats
    new = spark.createDataFrame(
        [(10**9, "spark hash spark")], "doc_id long, text string"
    )
    out = textstats.bm25_score_frozen(new, stats, terms=terms).collect()
    assert len(out) == 1 and out[0]["n_terms_matched"] == 2
    assert out[0]["bm25"] > 0


def test_bm25_topk_edges(spark):
    """bm25_topk edges: unmatched terms → empty result; term
    normalization lowercases (an uppercase query term still matches
    the lowercased corpus tokens); empty/blank term bags raise; NULL
    text neither matches nor contributes to corpus stats."""
    import pytest as _pytest

    from streamtasks_spark.llmdata import textstats

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta"), (3, None)],
        "doc_id long, text string",
    )
    assert textstats.bm25_topk(docs, terms=("zzz",), k=5).count() == 0
    up = {r["doc_id"]: r["rank"]
          for r in textstats.bm25_topk(docs, terms=("ALPHA ",), k=5).collect()}
    # doc 2 has tf=2 of alpha and equal dl → outranks doc 1
    assert up == {2: 1, 1: 2}
    with _pytest.raises(ValueError, match="non-empty term"):
        textstats.bm25_topk(docs, terms=())
    with _pytest.raises(ValueError, match="non-empty term"):
        textstats.bm25_topk(docs, terms=("  ",))


def test_pq_family_empty_corpus_is_empty_not_loud(spark):
    """pq_topk/ivf_pq_topk (r09 empty-input sweep): an EMPTY corpus
    returns an empty, schema-stable result — only the non-empty but
    unseedable corpus (no usable ids below n_codes) raises the loud
    codebook error."""
    import pytest as _pytest

    from streamtasks_spark.llmdata import similarity

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    q = spark.createDataFrame(
        [(0, [1.0] * 64)], "vec_id long, embedding array<float>"
    ).select("vec_id", F.col("embedding").cast("array<float>"))
    for fn in (similarity.pq_topk, similarity.ivf_pq_topk):
        out = fn(empty, q, n_codes=16, k=5)
        assert out.columns == [
            "query_id", "vec_id", "cosine", "approx", "rank"
        ]
        assert out.count() == 0
    # non-empty but unseedable (all ids >= n_codes) stays loud
    high = spark.createDataFrame(
        [(100, [1.0] * 64)], "vec_id long, embedding array<float>"
    ).select("vec_id", F.col("embedding").cast("array<float>"))
    with _pytest.raises(ValueError, match="seed the codebook"):
        similarity.pq_topk(high, q, n_codes=16, k=5)


def _sem_index_cls():
    from streamtasks_spark.llmdata.similarity import SemDedupIndex

    return SemDedupIndex


def test_sem_dedup_index_superset_of_one_shot(spark, tmp_path):
    """SemDedupIndex (r07): over batch-monotone ids and the SAME
    frozen codebook, the incremental keep-set must be a SUPERSET of
    the one-shot semantic_dedup keep-set (greedy domination by
    survivors can only drop less than any-mate domination), with
    identical cell assignments, identical id coverage, and the
    per-cell minimum id kept by both."""
    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = _sem_index_cls()(str(tmp_path / "semidx"), threshold=0.35)
    splits = [(0, 166), (166, 333), (333, 10**9)]
    parts = []
    for lo, hi in splits:
        batch = vecs.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        )
        parts.append(idx.ingest(batch).toPandas())
    import pandas as pd

    inc = (
        pd.concat(parts).sort_values("vec_id").reset_index(drop=True)
    )
    one = (
        similarity.semantic_dedup(vecs, centroids=idx.codebook(spark))
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert list(inc["vec_id"]) == list(one["vec_id"])
    assert (inc["cell"].values == one["cell"].values).all()
    # superset: anything one-shot keeps, incremental keeps
    assert bool((inc["keep"] | ~one["keep"]).all())
    # and the relationship is non-trivial on this data: one-shot drops
    assert (~one["keep"]).any()
    # per-cell min kept by both
    for df in (inc, one):
        mins = df.groupby("cell")["vec_id"].min()
        kept = set(df[df["keep"]]["vec_id"])
        assert set(mins).issubset(kept)


def test_sem_dedup_index_max_cell_guard(spark, tmp_path):
    """max_cell parity for the incremental index (r08): a cap at or
    above every dominator-cell population reproduces the uncapped
    verdicts exactly; a cap below the hottest cell excludes it from
    pairing — that cell's batch vectors all come back keep=true —
    while cells within the cap keep their exact verdicts."""
    import pandas as pd

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = (
        _sem_index_cls()(str(tmp_path / "ref"), threshold=0.35)
        .ingest(vecs).toPandas().sort_values("vec_id")
        .reset_index(drop=True)
    )
    pops = exact.groupby("cell").size()
    nop = (
        _sem_index_cls()(
            str(tmp_path / "nop"), threshold=0.35,
            max_cell=int(pops.max()),
        )
        .ingest(vecs).toPandas().sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert (nop.values == exact.values).all()
    hot = pops.idxmax()
    cap = int(pops.max()) - 1
    assert cap >= 1 and (~exact[exact["cell"] == hot]["keep"]).any()
    capped = (
        _sem_index_cls()(
            str(tmp_path / "cap"), threshold=0.35, max_cell=cap,
        )
        .ingest(vecs).toPandas().sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert capped[capped["cell"] == hot]["keep"].all()
    ok_cells = set(pops[pops <= cap].index)
    a = exact[exact["cell"].isin(ok_cells)]
    b = capped[capped["cell"].isin(ok_cells)]
    assert (a.values == b.values).all()
    assert list(capped["vec_id"]) == list(exact["vec_id"])


@pytest.mark.slow  # slow tier (pytest.ini, r12)
def test_sem_dedup_index_single_vector_batches_are_greedy(spark, tmp_path):
    """One-vector-per-batch ingestion must compute exactly the
    SemDeDup paper's greedy sequential scan: each arrival is dropped
    iff a KEPT earlier same-cell vector has cosine >= threshold.
    Reference implemented with the same left-to-right double fold as
    the Spark plan (sum_lr), so the comparison is bit-honest."""
    import math

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.llmdata.similarity import sum_lr

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 32
    )
    # pre-trained codebook (documented drop-in): train on the slice so
    # the 1-vector first batch doesn't degenerate the quantizer.
    # threshold 0.2: the 32-vector slice has enough >=0.2 same-cell
    # pairs to exercise BOTH verdicts (at the entry default 0.35 the
    # slice is drop-free and the greedy comparison proves nothing)
    idx = _sem_index_cls()(str(tmp_path / "semidx1"), threshold=0.2)
    similarity.train_centroids(
        vecs, n_cells=4, n_iters=2, expect_dim=64
    ).write.parquet(idx.codebook_path)
    rows = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in vecs.collect()
    }
    verdicts = {}
    for vid in sorted(rows):
        out = idx.ingest(vecs.filter(F.col("vec_id") == vid)).collect()
        assert len(out) == 1
        verdicts[vid] = (int(out[0]["cell"]), bool(out[0]["keep"]))
    # greedy reference over the index's own cell assignments
    kept_by_cell: dict[int, list[int]] = {}
    for vid in sorted(rows):
        cell, keep = verdicts[vid]
        v = rows[vid]
        nrm = math.sqrt(sum_lr(x * x for x in v))
        expected = True
        for prior in kept_by_cell.get(cell, []):
            u = rows[prior]
            un = math.sqrt(sum_lr(x * x for x in u))
            cos = sum_lr(a * b for a, b in zip(u, v)) / (un * nrm)
            if cos >= 0.2:
                expected = False
                break
        assert keep == expected, (vid, cell, keep, expected)
        if expected:
            kept_by_cell.setdefault(cell, []).append(vid)
    # the slice must exercise both verdicts or the test proves little
    outcomes = {k for _, k in verdicts.values()}
    assert outcomes == {True, False}, outcomes


def test_sem_dedup_index_restart_resumes_identically(spark, tmp_path):
    """Reopening an index from disk must continue exactly where a
    continuous run would be: batch-2 verdicts after a restart equal
    batch-2 verdicts of an uninterrupted two-batch run (the codebook
    and kept-history are the on-disk state, not object state)."""
    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = vecs.filter(F.col("vec_id") < 250)
    b2 = vecs.filter(F.col("vec_id") >= 250)

    cont = _sem_index_cls()(str(tmp_path / "cont"), threshold=0.35)
    cont.ingest(b1)
    v_cont = cont.ingest(b2).toPandas().sort_values("vec_id")

    rest = _sem_index_cls()(str(tmp_path / "rest"), threshold=0.35)
    rest.ingest(b1)
    reopened = _sem_index_cls()(str(tmp_path / "rest"), threshold=0.35)
    v_rest = reopened.ingest(b2).toPandas().sort_values("vec_id")

    assert (v_cont.values == v_rest.values).all()
    # and the on-disk kept table matches the union of kept verdicts
    kept = dedup.snapshot_read(spark, reopened.kept_path)
    assert kept.select("vec_id").distinct().count() == kept.count()


def test_hashed_tf_embed_matches_oracle_arrays_and_edges(spark):
    """hashed_tf_embed (r07): full ARRAY-level equality vs the DuckDB
    twin (the driver row only sees the scalar signature projection —
    this is where the raw vectors are pinned), across two dims, plus
    the NULL/whitespace/empty edge rows the fixed corpus lacks: NULL
    text → NULL embedding on BOTH engines (the oracle's coalesce must
    not manufacture a zero vector), whitespace/empty → exact zeros."""
    import duckdb

    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for dim in (16, 64):
        sdf = (
            textstats.hashed_tf_embed(docs, dim=dim)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        odf = (
            con.execute(textstats.oracle_hashed_tf_embed_sql(dim=dim))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert len(sdf) == len(odf) == docs.count()
        for a, b in zip(sdf["embedding"], odf["embedding"]):
            assert list(a) == list(b)
            assert len(a) == dim
        # non-degenerate: some doc has a nonzero vector
        assert any(any(x != 0 for x in a) for a in sdf["embedding"])

    edge = spark.createDataFrame(
        [(0, "hello world hello"), (1, None), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["embedding"]
        for r in textstats.hashed_tf_embed(edge, dim=8).collect()
    }
    con.execute("CREATE TABLE edge_docs(doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO edge_docs VALUES (?, ?)",
        [(0, "hello world hello"), (1, None), (2, "   "), (3, "")],
    )
    want = {
        r[0]: (None if r[1] is None else list(r[1]))
        for r in con.execute(textstats.oracle_hashed_tf_embed_sql(
            source_sql="SELECT doc_id, text FROM edge_docs", dim=8,
        )).fetchall()
    }
    for k in got:
        g = None if got[k] is None else list(got[k])
        assert g == want[k], (k, g, want[k])
    assert got[1] is None  # NULL text stays NULL
    assert list(got[2]) == [0] * 8  # whitespace-only → zero vector
    # repeated token accumulates: 'hello' twice has |weight| 2
    assert max(abs(x) for x in got[0]) == 2


def test_text_semantic_dedup_composition_matches_oracle(spark):
    """The model-free text semantic dedup composition (hashed TF
    embeddings → k-means → within-cluster domination) is bit-exact
    against the single composed DuckDB statement at a non-entry
    parameterization (param-hardcoding guard)."""
    import duckdb

    from streamtasks_spark.llmdata import similarity, textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    sdf = (
        similarity.semantic_dedup(
            textstats.hashed_tf_embed(docs, dim=32),
            id_col="doc_id", dim=32, n_cells=4, n_iters=1, threshold=0.85,
        ).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    odf = (
        con.execute(similarity.oracle_semantic_dedup_sql(
            source_sql=textstats.oracle_hashed_tf_embed_sql(dim=32),
            id_col="doc_id", dim=32, n_cells=4, n_iters=1, threshold=0.85,
        )).df().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(sdf) == len(odf)
    assert (sdf.values == odf.values).all()
    assert (~sdf["keep"]).any() and sdf["keep"].any()


def test_train_centroids_empty_seed_raises_loudly(spark):
    """If every id < n_cells is NULL/zero-norm (adversarial corpora can
    do this), the codebook would be empty — which must raise a clear
    ValueError on the DRIVER, not surface as a malformed argmax
    expression vs a silently-empty SQL twin."""
    import pytest as _pytest

    from streamtasks_spark.llmdata import similarity

    vecs = spark.createDataFrame(
        [(0, None), (1, [0.0] * 4), (8, [1.0, 0.0, 0.0, 0.0]),
         (9, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="seed the codebook"):
        similarity.train_centroids(vecs, n_cells=2, n_iters=1)
    with _pytest.raises(ValueError, match="empty codebook"):
        similarity._argmax_cell_expr({})


def test_doc_chunk_covers_every_token_with_exact_overlap(spark):
    """Property: doc_chunk's windows cover all n tokens in order —
    chunk c holds tokens [c*stride, min(c*stride+window, n)), the last
    chunk is never empty, and re-splicing chunk texts at the stride
    boundary reconstructs the normalized document. Degenerate docs
    (NULL / empty / whitespace-only) emit nothing."""
    from streamtasks_spark.llmdata import pipeline

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(57))),   # partial tail
            (1, " ".join(f"t{i}" for i in range(8))),    # single chunk
            (2, " ".join(f"t{i}" for i in range(48))),   # 4 chunks at W16/S12; last partial (36+16>48)
            (3, None), (4, ""), (5, " \t\n "),
            (6, "one"),
        ],
        "doc_id long, text string",
    )
    W, S = 16, 12
    out = (
        pipeline.doc_chunk(docs, window=W, stride=S)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    assert not [r for r in out if r["doc_id"] in (3, 4, 5)]
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    lens = {0: 57, 1: 8, 2: 48, 6: 1}
    for doc_id, rows in by_doc.items():
        n = lens[doc_id]
        toks = [f"t{i}" for i in range(n)] if n > 1 else ["one"]
        expect_chunks = (max(n - W, 0) + S - 1) // S + 1
        assert len(rows) == expect_chunks, (doc_id, len(rows))
        for r in rows:
            c = r["chunk_id"]
            want = toks[c * S: c * S + W]
            assert r["chunk_text"].split(" ") == want, (doc_id, c)
            assert r["n_chunk_tokens"] == len(want) > 0
        # stride-splice reconstruction: first chunk + tail of each next
        rebuilt = rows[0]["chunk_text"].split(" ")
        for r in rows[1:]:
            rebuilt += r["chunk_text"].split(" ")[len(rebuilt) - r["chunk_id"] * S:]
        assert rebuilt == toks


def test_doc_chunk_rejects_bad_geometry(spark):
    import pytest as _pytest

    from streamtasks_spark.llmdata import pipeline

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    for w, s in ((4, 5), (0, 1), (4, 0)):
        with _pytest.raises(ValueError, match="stride"):
            pipeline.doc_chunk(docs, window=w, stride=s)


def test_unigram_lm_edges_and_score_semantics(spark):
    """NULL text → all-NULL row; zero-token doc → n_tokens 0 with NULL
    ratios; an all-OOV doc scores exactly 0.0; a doc made purely of the
    corpus's dominant tokens outscores a rarer-token doc; every score
    sits in [0, 1] and oov_ratio is exact."""
    from streamtasks_spark.llmdata import quality

    docs = spark.createDataFrame(
        [
            (0, "the the the the cat"),       # dominant-token heavy
            (1, "cat sat mat"),                # mid
            # all OOV at vocab_size 4: the count-1 tie-break is token
            # ASC, so "mat"/"sat" claim the last two vocab slots and
            # "yyy"/"zzz" fall outside
            (2, "zzz yyy"),
            (3, None), (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in quality.unigram_lm(docs, vocab_size=4).collect()
    }
    assert rows[3]["n_tokens"] is None and rows[3]["score"] is None
    assert rows[4]["n_tokens"] == 0 and rows[4]["score"] is None
    assert rows[2]["score"] == 0.0 and rows[2]["oov_ratio"] == 1.0
    assert rows[0]["score"] > rows[1]["score"] > 0.0
    for r in (rows[0], rows[1], rows[2]):
        assert 0.0 <= r["score"] <= 1.0
        assert r["oov_count"] == round(r["oov_ratio"] * r["n_tokens"])


def test_ngram_lm_matches_oracle_and_degenerates_to_unigram(spark):
    """ngram_lm (r09): bit-exact vs its DuckDB twin at sf0.001 for
    n = 2 and n = 3, and at n = 1 exactly equal to unigram_lm (the
    1-gram units ARE the tokens, so the whole train/score path must
    coincide row for row)."""
    import duckdb

    from streamtasks_spark.llmdata import quality

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for n in (2, 3):
        sdf = (
            quality.ngram_lm(docs, n=n, vocab_size=64)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        odf = (
            con.execute(quality.oracle_ngram_lm_sql(n=n, vocab_size=64))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert len(sdf) == len(odf) == docs.count(), n
        assert (sdf.values == odf.values).all(), n
    uni = (
        quality.unigram_lm(docs, vocab_size=64)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    one = (
        quality.ngram_lm(docs, n=1, vocab_size=64)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert (uni.values == one.values).all()


def test_ngram_lm_edges_and_fluency_semantics(spark):
    """The bigram scorer's point: word-salad with plausible unigrams
    scores 0 (its PAIRS never recur) while natural repetition scores
    high. Short docs (< n words) have zero scoring units → NULL
    ratios; NULL text → all-NULL row; n < 1 raises."""
    import pytest as _pytest

    from streamtasks_spark.llmdata import quality

    docs = spark.createDataFrame(
        [
            (0, "the cat sat the cat sat the cat sat"),  # recurring pairs
            (1, "sat the cat"),        # same unigrams, one recurring order
            (2, "cat the sat cat"),    # salad: pairs unseen elsewhere
            (3, "word"),               # 1 word: zero bigrams
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in quality.ngram_lm(docs, vocab_size=4).collect()
    }
    assert rows[4]["n_tokens"] is None and rows[4]["score"] is None
    assert rows[3]["n_tokens"] == 0 and rows[3]["score"] is None
    assert rows[0]["score"] > 0.0
    assert rows[0]["score"] > rows[2]["score"]
    assert rows[0]["n_tokens"] == 8  # 9 words -> 8 bigram units
    with _pytest.raises(ValueError, match="n must be"):
        quality.ngram_lm(docs, n=0)


def test_bloom_dedup_membership_and_oracle(spark):
    """bloom_dedup (r09): NO false negatives — every doc whose
    normalized text exists in the reference is flagged (probing the
    reference against itself flags every row with all bits hit);
    bit-exact vs the DuckDB twin INCLUDING false positives at a
    deliberately saturated m; NULL text never matches."""
    import duckdb

    from streamtasks_spark.llmdata import dedup

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # self-membership: ref probed against itself
    self_probe = dedup.bloom_dedup(docs, docs, m_bits=65536).collect()
    assert all(r["maybe_dup"] and r["n_bits_hit"] == 5 for r in self_probe)
    assert len(self_probe) == docs.count()
    # cross-engine, small m (forces false positives) and default-ish m
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM '{sf_dir}/documents.parquet'"
    )
    for m in (512, 65536):
        sdf = (
            dedup.bloom_dedup(
                docs.filter(F.col("doc_id") % 3 == 0),
                docs.filter(F.col("doc_id") % 3 != 0),
                m_bits=m,
            )
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        odf = (
            con.execute(dedup.oracle_bloom_dedup_sql(m_bits=m))
            .df().sort_values("doc_id").reset_index(drop=True)
        )
        assert len(sdf) == len(odf), m
        assert (sdf.values == odf.values).all(), m
    # NULL text: 0 hits, never flagged
    nd = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = dedup.bloom_dedup(nd, docs).collect()
    assert len(r) == 1
    assert r[0]["n_bits_hit"] == 0 and not r[0]["maybe_dup"]


def test_cluster_profile_matches_oracle_and_frozen_codebook(spark):
    """cluster_profile (r09): bit-exact vs the DuckDB CTE k-means twin
    across (n_cells, n_iters) geometries; a frozen centroids table
    gives the same profile as in-call training (production quantizer
    semantics); membership covers every norm-surviving vector."""
    import duckdb

    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{sf_dir}/embeddings.parquet'"
    )
    for n_cells, n_iters in ((4, 2), (8, 3)):
        sdf = (
            similarity.cluster_profile(
                vecs, n_cells=n_cells, n_iters=n_iters
            )
            .toPandas().sort_values("cell").reset_index(drop=True)
        )
        odf = (
            con.execute(similarity.oracle_cluster_profile_sql(
                n_cells=n_cells, n_iters=n_iters
            ))
            .df().sort_values("cell").reset_index(drop=True)
        )
        assert len(sdf) == len(odf) > 0, (n_cells, n_iters)
        assert (sdf.values == odf.values).all(), (n_cells, n_iters)
        assert sdf["n_members"].sum() == vecs.count()
    frozen = similarity.train_centroids(vecs, n_cells=8, n_iters=3)
    a = (
        similarity.cluster_profile(vecs, centroids=frozen)
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    b = (
        similarity.cluster_profile(vecs, n_cells=8, n_iters=3)
        .toPandas().sort_values("cell").reset_index(drop=True)
    )
    assert (a.values == b.values).all()


def test_cluster_prune_matches_oracle_and_d4_invariants(spark):
    """cluster_prune (r10): bit-exact vs the DuckDB CTE k-means twin
    across rate geometries; the D4 invariants hold — every cluster
    keeps >= 1 member, the kept member with rank 1 is the FARTHEST
    from its centroid (most diverse kept first), tighter clusters
    keep a smaller fraction under a spread-out rate band, one row per
    norm-surviving vector, and a frozen codebook reproduces in-call
    training; a bad rate band raises."""
    import duckdb

    import pytest as _pytest

    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{sf_dir}/embeddings.parquet'"
    )
    for rf, rc in ((0.3, 0.9), (0.0, 1.0), (0.5, 0.5)):
        sdf = (
            similarity.cluster_prune(vecs, rate_floor=rf, rate_ceil=rc)
            .toPandas().sort_values("vec_id").reset_index(drop=True)
        )
        odf = (
            con.execute(similarity.oracle_cluster_prune_sql(
                rate_floor=rf, rate_ceil=rc
            ))
            .df().sort_values("vec_id").reset_index(drop=True)
        )
        assert len(sdf) == len(odf) == vecs.count(), (rf, rc)
        assert (sdf[sorted(sdf.columns)].values
                == odf[sorted(odf.columns)].values).all(), (rf, rc)
    out = similarity.cluster_prune(vecs).toPandas()
    per_cell = out.groupby("cell")
    assert (per_cell["keep"].sum() >= 1).all()  # always-keep-one
    for _, grp in per_cell:
        g = grp.sort_values("cell_rank")
        # most-diverse-first: cosine nondecreasing along the rank, and
        # the kept set is a rank prefix (no kept row after a dropped)
        assert (g["cosine"].diff().dropna() >= -1e-9).all()
        flags = list(g["keep"])
        assert flags == sorted(flags, reverse=True)
    assert 0 < out["keep"].sum() < len(out)  # non-vacuous both ways
    frozen = similarity.train_centroids(vecs, n_cells=8, n_iters=3)
    a = (
        similarity.cluster_prune(vecs, centroids=frozen)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        similarity.cluster_prune(vecs, n_cells=8, n_iters=3)
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert (a.values == b.values).all()
    with _pytest.raises(ValueError, match="rate_floor"):
        similarity.cluster_prune(vecs, rate_floor=0.9, rate_ceil=0.3)


def test_cluster_prune_frozen_policy_matches_rank_form(spark):
    """cluster_prune_frozen (r10): the frozen (codebook, cutoffs)
    policy reproduces the rank form's verdicts on the reference
    corpus itself — keep-set a SUPERSET differing only at rounded-
    cosine ties across the rank boundary (the purity trade the
    streaming twin needs), one row per vector, and a cell's extras
    all sit exactly ON its cutoff."""
    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.train_centroids(vecs, n_cells=8, n_iters=3)
    ranked = similarity.cluster_prune(vecs, centroids=cents).toPandas()
    cutoffs = similarity.prune_cutoffs(
        similarity.cluster_prune(vecs, centroids=cents)
    )
    frozen = similarity.cluster_prune_frozen(
        vecs, centroids=cents, cutoffs=cutoffs
    ).toPandas()
    assert len(frozen) == len(ranked) == vecs.count()
    r = ranked.set_index("vec_id").sort_index()
    f = frozen.set_index("vec_id").sort_index()
    assert (r["cell"] == f["cell"]).all()
    assert (r["cosine"] == f["cosine"]).all()
    cut = dict(cutoffs)
    # superset: every rank-kept vector is policy-kept
    assert bool(f.loc[r[r["keep"]].index, "keep"].all())
    # extras are exactly the boundary ties
    extra = f[f["keep"] & ~r["keep"]]
    for vid, row in extra.iterrows():
        assert row["cosine"] == cut[int(row["cell"])], vid
    # and rank-dropped strictly past the cutoff stay dropped
    dropped = f[~f["keep"]]
    for _, row in dropped.iterrows():
        assert row["cosine"] > cut[int(row["cell"])]


def test_heavy_hitters_candidates_dictionary_restricts_exactly(spark):
    """heavy_hitters_cms(candidates=...) (r10): the dictionary hook
    the 100 TB caveat prescribes — the restricted output equals the
    full run filtered to the dictionary tokens (same sketch, same
    total, same bar), and dictionary tokens absent from the corpus
    report nothing."""
    from streamtasks_spark.llmdata import textstats

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {
        r["token"]: (r["est"], r["true_count"], r["overestimate"])
        for r in textstats.heavy_hitters_cms(
            docs, width=64, depth=3, phi=0.002
        ).collect()
    }
    assert len(full) >= 4
    toks = sorted(full)
    dictionary = toks[::2] + ["__never_in_corpus__"]
    cand = docs.sparkSession.createDataFrame(
        [(t,) for t in dictionary], "token string"
    )
    got = {
        r["token"]: (r["est"], r["true_count"], r["overestimate"])
        for r in textstats.heavy_hitters_cms(
            docs, width=64, depth=3, phi=0.002, candidates=cand
        ).collect()
    }
    assert got == {t: full[t] for t in toks[::2]}


def test_bloom_index_batch_equivalence_and_compaction(spark, tmp_path):
    """BloomIndex (r09): probing after ingesting batches B1..Bn equals
    the one-shot bloom_dedup against their union (the bit set is a
    pure set union — batching-independent by construction); ingest
    probes HISTORY only; compaction changes nothing observable."""
    from streamtasks_spark.llmdata import dedup

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ref = docs.filter(F.col("doc_id") % 3 != 0)
    new = docs.filter(F.col("doc_id") % 3 == 0)
    idx = dedup.BloomIndex(str(tmp_path / "bloomidx"), m_bits=65536)
    # first ingest: empty history -> nothing can be flagged
    first = idx.ingest(ref.filter(F.col("doc_id") % 2 == 0)).collect()
    assert all(r["n_bits_hit"] == 0 for r in first)
    idx.ingest(ref.filter(F.col("doc_id") % 2 != 0))
    got = {
        r["doc_id"]: (r["n_bits_hit"], r["maybe_dup"])
        for r in idx.probe(new).collect()
    }
    expect = {
        r["doc_id"]: (r["n_bits_hit"], r["maybe_dup"])
        for r in dedup.bloom_dedup(new, ref, m_bits=65536).collect()
    }
    assert got == expect and len(got) > 0
    # compaction folds duplicates/part-files; observable state unchanged
    idx.compact(spark)
    after = {
        r["doc_id"]: (r["n_bits_hit"], r["maybe_dup"])
        for r in idx.probe(new).collect()
    }
    assert after == expect
    # re-ingesting already-present text flags everything (history hit)
    re_in = idx.ingest(ref.limit(20)).collect()
    assert all(r["maybe_dup"] for r in re_in)


def test_semantic_decontaminate_matches_oracle_and_semantics(spark):
    """semantic_decontaminate (r09): bit-exact vs DuckDB across
    thresholds at sf0.001; a corpus vector identical to an eval vector
    reports cosine 1.0 with that eval as champion; zero-norm and NULL
    vectors drop at the norm gate on both sides."""
    import duckdb

    from streamtasks_spark.llmdata import similarity

    sf_dir = "/root/testdata/sf0.001"
    vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{sf_dir}/embeddings.parquet'"
    )
    for t in (0.3, 0.35, 0.45):
        sdf = (
            similarity.semantic_decontaminate(
                vecs.filter(F.col("vec_id") % 10 != 3),
                vecs.filter(F.col("vec_id") % 10 == 3),
                threshold=t,
            )
            .toPandas().sort_values("vec_id").reset_index(drop=True)
        )
        odf = (
            con.execute(
                similarity.oracle_semantic_decontaminate_sql(threshold=t)
            )
            .df().sort_values("vec_id").reset_index(drop=True)
        )
        assert len(sdf) == len(odf) > 0, t
        assert (sdf.values == odf.values).all(), t
    # identical vector across the split: flagged at exactly 1.0
    base = [0.5] * 64
    corpus = spark.createDataFrame(
        [(100, base), (101, [float(i) for i in range(64)]),
         (102, [0.0] * 64), (103, None)],
        "vec_id long, embedding array<float>",
    ).select("vec_id", F.col("embedding").cast("array<float>"))
    ev = spark.createDataFrame(
        [(7, base)], "vec_id long, embedding array<float>"
    ).select("vec_id", F.col("embedding").cast("array<float>"))
    got = {
        r["vec_id"]: r
        for r in similarity.semantic_decontaminate(
            corpus, ev, threshold=0.99
        ).collect()
    }
    assert set(got) == {100}
    assert got[100]["best_eval"] == 7
    assert got[100]["best_cos"] == 1.0
    assert got[100]["n_eval_hits"] == 1


def test_unigram_lm_agrees_with_oracle_on_duplicate_ids(spark):
    """Non-unique ids: Spark's groupBy(id) merges duplicate rows' token
    streams into ONE output row (any NULL-text member NULLs it); the
    oracle must do the same — its pre-fix final join emitted one row
    per SOURCE row and diverged (r07 review finding). A NULL id is one
    ordinary group too: Spark's groupBy keeps it, but a plain equi-join
    in the oracle would drop it (NULL never join-matches), so the final
    join is NULL-safe (r07 advisor finding)."""
    import duckdb

    from streamtasks_spark.llmdata import quality

    rows = [
        (7, "a b"), (7, None),          # dup id with a NULL member
        (8, "a a b"), (8, "zz yy"),     # dup id, both textual
        (9, "b"), (10, ""),
        (None, "a b zz"),               # NULL id: one real scored group
    ]
    sdf = (
        quality.unigram_lm(
            spark.createDataFrame(rows, "doc_id long, text string"),
            vocab_size=2,
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    odf = (
        con.execute(quality.oracle_unigram_lm_sql(
            source_sql="SELECT doc_id, text FROM d", vocab_size=2,
        ))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import numpy as np
    # NaN sorts last on both sides: [7, 8, 9, 10, NULL]
    assert list(sdf["doc_id"][:4]) == [7, 8, 9, 10] == list(odf["doc_id"][:4])
    assert np.isnan(sdf["doc_id"].iloc[4]) and np.isnan(odf["doc_id"].iloc[4])
    for c in sdf.columns:
        a, b = sdf[c].to_numpy(), odf[c].to_numpy()
        for x, y in zip(a, b):
            if x is None or (isinstance(x, float) and np.isnan(x)):
                assert y is None or (isinstance(y, float) and np.isnan(y)), c
            else:
                assert x == y, (c, x, y)
    # id 7 NULLed by its NULL member; id 8 merged (5 tokens); the
    # NULL-id group carries its real counts (pre-fix oracle: all NULL)
    assert sdf.loc[0, "n_tokens"] is None or np.isnan(sdf.loc[0, "n_tokens"])
    assert sdf.loc[1, "n_tokens"] == 5
    assert sdf.loc[4, "n_tokens"] == 3 == odf.loc[4, "n_tokens"]
    assert odf.loc[4, "score"] > 0.0


def test_pin_scope_bounds_long_session_cache_growth(spark):
    """The r07→r08 watch item, closed (r08 verdict task 7): unigram_lm's
    corpus-tokenization pin sits in the returned plan's lineage, so a
    long-lived session invoking it repeatedly accumulated one cache
    entry per call. pin_scope() is the unpersist handle: after each
    scoped invocation the session's cache is EMPTY again, for as many
    iterations as the session lives — and values are unchanged."""
    from streamtasks_spark.llmdata import quality
    from streamtasks_spark.llmdata.dedup import pin_scope

    spark.catalog.clearCache()
    cache = spark._jsparkSession.sharedState().cacheManager()
    assert cache.isEmpty()

    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} the cat sat on tok{i % 5}") for i in range(50)],
        "doc_id long, text string",
    )
    baseline = quality.unigram_lm(docs, vocab_size=8).collect()
    spark.catalog.clearCache()

    # the leak shape: unscoped calls accumulate lineage pins
    quality.unigram_lm(docs, vocab_size=8).count()
    assert not cache.isEmpty()
    spark.catalog.clearCache()

    # the handle: a long session of scoped calls stays at zero entries
    for _ in range(4):
        with pin_scope():
            got = quality.unigram_lm(docs, vocab_size=8).collect()
        assert cache.isEmpty()
    assert sorted(map(tuple, got)) == sorted(map(tuple, baseline))

    # scope releases on exception too, and nesting is idempotent
    try:
        with pin_scope():
            with pin_scope():
                quality.unigram_lm(docs, vocab_size=8).count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert cache.isEmpty()


def test_dedup_against_semantics_and_champion(spark):
    """Cross-corpus dedup (NEW r09): a new doc embedded in the
    reference reports every match with the deterministic champion
    (highest 6-dp jaccard, lowest ref id on ties); clean new docs are
    absent; ref×ref and new×new pairs are never formed (a duplicate
    WITHIN the reference must not surface, nor two dup new docs with
    no ref match); blocking is inherited; a doc present in both frames
    matches itself at 1.0; max_df under-reports only."""
    from pyspark.sql import functions as F  # noqa: F811

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    text_b = "one two three four five six seven eight"
    rows_new = [
        (3, text_a, "en"),                 # near-dup of refs 10, 11
        (6, "totally different words entirely here now", "en"),
        (9, text_b, "de"),                 # dup of ref 12 but wrong block
        (12, text_b, "en"),                # dup of new 15 — but new×new
        (15, text_b, "en"),                #   must not pair them
        (30, text_a, "en"),                # also in ref verbatim (id 30)
    ]
    rows_ref = [
        (10, text_a, "en"),                # exact dup of new 3
        (11, text_a + " tail", "en"),      # near-dup of new 3
        (13, text_b, "fr"),                # wrong block for new 9
        (20, "unrelated reference content goes here fine", "en"),
        (21, "unrelated reference content goes here fine", "en"),  # ref dup
        (30, text_a, "en"),                # same id+text as a new doc
    ]
    new = spark.createDataFrame(rows_new, "doc_id long, text string, lang string")
    ref = spark.createDataFrame(rows_ref, "doc_id long, text string, lang string")
    got = {
        r["doc_id"]: r
        for r in dedup.dedup_against(new, ref, threshold=0.5).collect()
    }
    assert set(got) == {3, 30}
    # champion: refs 10 and 30 both match new 3 at jaccard 1.0 → lowest id
    assert got[3]["n_ref_matches"] == 3          # refs 10, 11, 30
    assert got[3]["best_ref"] == 10 and got[3]["best_jaccard"] == 1.0
    assert got[30]["best_jaccard"] == 1.0        # present in both frames
    # max_df guard: cap below the hot shingles' df drops the matches —
    # under-report, never a false one
    capped = dedup.dedup_against(new, ref, threshold=0.5, max_df=1).collect()
    assert {r["doc_id"] for r in capped} <= {3, 30}


def test_pq_topk_exactness_and_convergence(spark):
    """Product-quantized top-k (NEW r09): every returned cosine equals
    the exact brute-force cosine bit-for-bit (quantization only shapes
    CANDIDATE selection; the re-rank is exact); at a rerank covering
    the whole corpus the candidate stage is a no-op filter and the
    output reproduces cosine_topk's frame EXACTLY; dim guards raise
    loudly (indivisible m_sub, mismatched corpus dim)."""
    import pytest as _pytest

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 20)
    brute = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.cosine_topk(vecs, qs, k=5).collect()
    }
    got = similarity.pq_topk(vecs, qs, n_codes=16, k=5, rerank=8).collect()
    assert len(got) == len(brute)
    for r in got:
        if (r["query_id"], r["vec_id"]) in brute:
            assert r["cosine"] == brute[(r["query_id"], r["vec_id"])][0]
        # the ADC approximation stays a sane cosine surrogate
        assert -1.5 < r["approx"] < 1.5
    # full-rerank convergence: candidates cover the corpus
    n = vecs.count()
    full = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.pq_topk(
            vecs, qs, n_codes=16, k=5, rerank=(n // 5) + 1
        ).collect()
    }
    assert full == brute
    with _pytest.raises(ValueError, match="not divisible"):
        similarity.pq_topk(vecs, qs, m_sub=7)
    with _pytest.raises(Exception, match="dim"):
        similarity.pq_topk(vecs, qs, dim=32, m_sub=8).collect()


def test_pq_topk_matches_oracle_across_geometries(spark):
    """pq_topk vs its DuckDB twin — which re-derives the per-subspace
    codebooks with its own CTE k-means chain (never receives them as
    literals) — must be bit-exact across (m_sub, n_codes, n_iters,
    rerank) geometries: codebook training, grid encoding, integer ADC
    ranking, and exact re-rank all agree or the whole frame hashes
    differently."""
    import duckdb

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{SF_DIR}/embeddings.parquet'"
    )
    qs = vecs.filter(F.col("vec_id") < 10)
    for m_sub, n_codes, n_iters, rerank in (
        (8, 16, 2, 8), (4, 8, 1, 4), (16, 8, 3, 2),
    ):
        sdf = (
            similarity.pq_topk(
                vecs, qs, m_sub=m_sub, n_codes=n_codes, n_iters=n_iters,
                k=5, rerank=rerank,
            )
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        odf = (
            con.execute(similarity.oracle_pq_topk_sql(
                m_sub=m_sub, n_codes=n_codes, n_iters=n_iters,
                k=5, rerank=rerank,
            ))
            .df().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        assert sdf.shape == odf.shape and len(sdf) > 0, (m_sub, n_codes)
        assert (sdf.values == odf.values).all(), (m_sub, n_codes, n_iters)


def test_ivf_pq_topk_converges_and_matches_oracle(spark):
    """IVF×PQ (NEW r09): when rerank·k covers every probed cell's
    population the integer ADC stage is a no-op filter and the exact
    re-rank must reproduce plain ivf_topk's frame EXACTLY; at the
    production rerank it stays a high-recall subset ranked by true
    cosine; and the whole composite — CTE-re-derived codebooks, cell
    assignment, ADC ranking, re-rank — is bit-exact vs the DuckDB twin
    across geometries."""
    import duckdb

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 10)
    n = vecs.count()
    ivf = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.ivf_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5
        ).collect()
    }
    full = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.ivf_pq_topk(
            vecs, qs, n_cells=8, n_probe=2, n_codes=16, k=5,
            rerank=(n // 5) + 1,
        ).collect()
    }
    assert full == ivf
    prod = similarity.ivf_pq_topk(
        vecs, qs, n_cells=8, n_probe=2, n_codes=16, k=5, rerank=8
    ).collect()
    for r in prod:
        key = (r["query_id"], r["vec_id"])
        if key in ivf:
            assert r["cosine"] == ivf[key][0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{SF_DIR}/embeddings.parquet'"
    )
    for n_cells, n_probe, n_codes, rerank in ((8, 2, 16, 8), (4, 3, 8, 4)):
        sdf = (
            similarity.ivf_pq_topk(
                vecs, qs, n_cells=n_cells, n_probe=n_probe,
                n_codes=n_codes, k=5, rerank=rerank,
            )
            .toPandas().sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        odf = (
            con.execute(similarity.oracle_ivf_pq_topk_sql(
                n_cells=n_cells, n_probe=n_probe, n_codes=n_codes,
                k=5, rerank=rerank,
            ))
            .df().sort_values(["query_id", "rank"]).reset_index(drop=True)
        )
        assert sdf.shape == odf.shape and len(sdf) > 0, (n_cells, n_codes)
        assert (sdf.values == odf.values).all(), (n_cells, n_probe, rerank)


# ------------------------------------------------- codebook drift (r11)


def test_ann_drift_probe_matches_ivf_pq_index_stats(spark, tmp_path):
    """The certified probe and the index's per-ingest stats/ rows are
    the SAME fragment (_drift_stats) fed the same frozen codebooks —
    ingesting the probe's two batches into an IvfPqIndex built from
    batch-1-trained codebooks must reproduce the probe's numbers
    bit-exactly (ingest_id 1/2 <-> batch_id 0/1)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    split = 250
    b1 = vecs.filter(F.col("vec_id") < split)
    b2 = vecs.filter(F.col("vec_id") >= split)
    probe = {
        r["batch_id"]: (
            r["n"], r["mean_win_cosine"], r["mean_adc_err"],
            r["win_cos_drop"], r["adc_err_rise"],
        )
        for r in similarity.ann_drift_probe(vecs, split_id=split).collect()
    }
    cents = similarity.train_centroids(b1, n_cells=8, n_iters=2)
    pqcb = similarity.train_pq_codebooks(
        b1, dim=64, m_sub=8, n_codes=8, n_iters=2
    )
    idx = similarity.IvfPqIndex(
        str(tmp_path / "ivfpq"), n_cells=8, m_sub=8, n_codes=8
    )
    idx.ingest(b1, codebook=cents, pq_codebooks=pqcb)
    idx.ingest(b2)
    report = {
        r["ingest_id"] - 1: (
            r["n"], r["mean_win_cosine"], r["mean_adc_err"],
            r["win_cos_drop"], r["adc_err_rise"],
        )
        for r in idx.drift_report(spark).collect()
    }
    assert report == probe


def test_ivf_pq_drift_report_flags_shifted_batch(spark, tmp_path):
    """A second ingest drawn from a deliberately SHIFTED distribution
    must show up in the report: winning cosine drops and self-ADC
    error moves — the measured rebuild trigger."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    b1 = vecs.filter(F.col("vec_id") < 250)
    # constant offset: every vector's direction collapses toward the
    # all-ones axis, far from codebooks trained on the raw cloud
    b2 = vecs.filter(F.col("vec_id") >= 250).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(x + 3.0 as double))"
        ).alias("embedding"),
    )
    idx = similarity.IvfPqIndex(str(tmp_path / "ivfpq"), n_cells=8)
    idx.ingest(b1)
    idx.ingest(b2)
    rows = {
        r["ingest_id"]: r for r in idx.drift_report(spark).collect()
    }
    assert rows[1]["win_cos_drop"] == 0.0
    assert rows[1]["adc_err_rise"] == 0.0
    assert rows[2]["win_cos_drop"] > 0.02, rows[2]
    assert rows[2]["adc_err_rise"] > 0.05, rows[2]


def test_ivf_index_drift_report(spark, tmp_path):
    """IvfIndex carries the coarse-only stats row per ingest; an
    identically-distributed second batch drifts far less than a
    shifted one."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8)
    idx.ingest(vecs.filter(F.col("vec_id") < 250))
    idx.ingest(vecs.filter(F.col("vec_id") >= 250))
    rows = sorted(
        idx.drift_report(spark).collect(), key=lambda r: r["ingest_id"]
    )
    assert [r["ingest_id"] for r in rows] == [1, 2]
    assert rows[0]["win_cos_drop"] == 0.0
    assert all(r["n"] > 0 for r in rows)
    assert set(rows[0].asDict()) == {
        "ingest_id", "n", "mean_win_cosine", "win_cos_drop"
    }


def test_ivf_pq_res_topk_converges_and_matches_oracle(spark):
    """Residual IVF-PQ (r11): at full rerank the ADC stage is a no-op
    filter and the exact re-rank reproduces plain ivf_topk exactly; at
    production rerank cosines of shared pairs are exact; the whole
    composite (seeded coarse books, pooled-residual k-means, cell-dot
    + integer LUT candidate score, re-rank) is bit-exact vs the DuckDB
    twin; and the measured recall of the residual rung is >= the
    non-residual one on the probe (the point of residual coding)."""
    import duckdb

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").cache()
    qs = vecs.filter(F.col("vec_id") < 10)
    n = vecs.count()
    ivf = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.ivf_topk(
            vecs, qs, n_cells=8, n_probe=2, k=5
        ).collect()
    }
    full = {
        (r["query_id"], r["vec_id"]): (r["cosine"], r["rank"])
        for r in similarity.ivf_pq_res_topk(
            vecs, qs, n_cells=8, n_probe=2, n_codes=16, k=5,
            rerank=(n // 5) + 1,
        ).collect()
    }
    assert full == ivf
    prod = similarity.ivf_pq_res_topk(
        vecs, qs, n_cells=8, n_probe=2, n_codes=16, k=5, rerank=8
    ).collect()
    assert prod
    for r in prod:
        key = (r["query_id"], r["vec_id"])
        if key in ivf:
            assert r["cosine"] == ivf[key][0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * "
        f"FROM '{SF_DIR}/embeddings.parquet'"
    )
    got = sorted(
        (r["query_id"], r["vec_id"], r["cosine"], r["approx"], r["rank"])
        for r in prod
    )
    want = sorted(
        tuple(t)
        for t in con.execute(
            similarity.oracle_ivf_pq_res_topk_sql(
                n_cells=8, n_probe=2, n_codes=16, k=5, rerank=8
            )
        ).fetchall()
    )
    assert got == want
    rec = {
        r["method"]: r["recall"]
        for r in similarity.recall_probe(vecs, qs).collect()
    }
    assert "ivf_pq_res" in rec
    assert rec["ivf_pq_res"] >= rec["ivf_pq"], rec


def test_bounded_collect_enforces_driver_bound(spark):
    """bounded_collect (r11): the codebook-class driver pulls now
    ENFORCE the row bound their comments argue — at the bound the pull
    succeeds in full; past it, a loud ValueError instead of a silent
    driver OOM at 100x. End to end: duplicate ids below n_cells make
    the seed pull exceed its bound and training fails loudly."""
    import pytest

    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.llmdata.dedup import bounded_collect
    from streamtasks_spark.session import read_parquet

    df = spark.range(100)
    assert len(bounded_collect(df, 100, "exact-bound pull")) == 100
    with pytest.raises(ValueError, match="exceeded its documented bound"):
        bounded_collect(df, 99, "misconfigured sketch")

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    doubled = vecs.unionByName(vecs)  # every seed id appears twice
    with pytest.raises(ValueError, match="train_centroids seeds"):
        similarity.train_centroids(doubled, n_cells=8, n_iters=1)


@pytest.mark.slow  # slow tier (pytest.ini, r12)
def test_ivf_pq_index_rebuild_retrains_and_matches_one_shot(spark, tmp_path):
    """rebuild (r11) — the action the drift report exists to trigger:
    after a drifted second ingest, rebuilding retrains both codebooks
    on the raw side table and re-encodes; the measured winning cosine
    improves, the drift baseline resets, the rebuilt index answers
    exactly like a one-shot index fed the same retrained codebooks,
    and post-rebuild ingests land in the new epoch."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    b1 = vecs.filter(F.col("vec_id") < 250)
    b2 = vecs.filter(F.col("vec_id") >= 250).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(x + 3.0 as double))"
        ).alias("embedding"),
    )
    kw = dict(n_cells=8, n_probe=2, m_sub=8, n_codes=8)
    idx = similarity.IvfPqIndex(str(tmp_path / "ivfpq"), **kw)
    idx.ingest(b1)
    idx.ingest(b2)
    rows = {r["ingest_id"]: r for r in idx.drift_report(spark).collect()}
    assert rows[2]["win_cos_drop"] > 0.02  # drift visible pre-rebuild

    res = idx.rebuild(spark, coarse_iters=3)
    assert res["after_win_cosine"] > res["before_win_cosine"], res
    rep2 = idx.drift_report(spark).collect()
    assert [r["ingest_id"] for r in rep2] == [1]  # fresh baseline
    assert rep2[0]["win_cos_drop"] == 0.0

    # one-shot twin fed the SAME retrained codebooks answers equally
    union = b1.unionByName(b2)
    cents = similarity.train_centroids(union, n_cells=8, n_iters=3)
    pqcb = similarity.train_pq_codebooks(
        union, dim=64, m_sub=8, n_codes=8, n_iters=2
    )
    one = similarity.IvfPqIndex(str(tmp_path / "one"), **kw)
    one.ingest(union, codebook=cents, pq_codebooks=pqcb)
    qs = vecs.filter(F.col("vec_id") < 5)

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(idx.query(qs, k=3)) == canon(one.query(qs, k=3))

    # the new epoch accepts further ingests and reports against the
    # REBUILT baseline
    b3 = vecs.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    idx.ingest(b3)
    rep3 = {r["ingest_id"]: r for r in idx.drift_report(spark).collect()}
    assert set(rep3) == {1, 2}
    assert idx.query(qs, k=3).count() > 0


@pytest.mark.slow  # slow tier (pytest.ini, r12)
def test_ivf_pq_index_rebuild_crash_at_flip(spark, tmp_path, monkeypatch):
    """A crash at the index root's epoch flip — the ONE commit point
    of a rebuild — leaves the old epoch fully live: same answers, same
    drift report; the staged epoch is an invisible orphan a clean
    retry sweeps."""
    import os

    import pytest as _pytest

    from streamtasks_spark.core import state
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    idx = similarity.IvfPqIndex(str(tmp_path / "ivfpq"), n_cells=8)
    idx.ingest(vecs.filter(F.col("vec_id") < 250))
    idx.ingest(vecs.filter(F.col("vec_id") >= 250))
    qs = vecs.filter(F.col("vec_id") < 5)
    before_q = sorted(tuple(r) for r in idx.query(qs, k=3).collect())
    before_rep = sorted(
        tuple(r) for r in idx.drift_report(spark).collect()
    )

    root_manifest = os.path.join(idx.path, "_MANIFEST.json")
    orig = state._flip

    def dying_flip(tmp, dst):
        if dst == root_manifest:
            raise RuntimeError("injected crash at epoch flip")
        orig(tmp, dst)

    monkeypatch.setattr(state, "_flip", dying_flip)
    with _pytest.raises(RuntimeError, match="injected crash"):
        idx.rebuild(spark)
    monkeypatch.undo()

    assert sorted(tuple(r) for r in idx.query(qs, k=3).collect()) == before_q
    assert sorted(
        tuple(r) for r in idx.drift_report(spark).collect()
    ) == before_rep
    res = idx.rebuild(spark)  # clean retry
    assert res["n"] > 0
    # exactly one live epoch remains; the crashed stage was swept
    live = state.read_manifest(idx.path)["segments"]
    segs = [e for e in os.listdir(idx.path) if e.startswith("seg_")]
    assert sorted(segs) == sorted(live) and len(live) == 1


def test_ivf_index_rebuild_retrains_and_queries(spark, tmp_path):
    """IvfIndex.rebuild (r11): after a drifted second ingest, the
    rebuilt coarse codebook measurably improves the mean winning
    cosine, the drift baseline resets, and queries keep answering
    (now against the full-k-means codebook under the new epoch)."""
    from streamtasks_spark.llmdata import similarity
    from streamtasks_spark.session import read_parquet

    vecs = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    b1 = vecs.filter(F.col("vec_id") < 250)
    b2 = vecs.filter(F.col("vec_id") >= 250).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(x + 3.0 as double))"
        ).alias("embedding"),
    )
    idx = similarity.IvfIndex(str(tmp_path / "ivf"), n_cells=8, n_probe=2)
    idx.ingest(b1)
    idx.ingest(b2)
    res = idx.rebuild(spark, coarse_iters=3)
    assert res["after_win_cosine"] > res["before_win_cosine"], res
    rep = idx.drift_report(spark).collect()
    assert [r["ingest_id"] for r in rep] == [1]
    assert rep[0]["win_cos_drop"] == 0.0
    qs = vecs.filter(F.col("vec_id") < 5)
    assert idx.query(qs, k=3).count() > 0
    # post-rebuild ingest lands in the new epoch and reports against
    # the rebuilt baseline
    idx.ingest(
        vecs.filter(F.col("vec_id") < 100).select(
            (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
        )
    )
    assert [
        r["ingest_id"] for r in idx.drift_report(spark).collect()
    ] == [1, 2]


def test_cluster_profile_dim_guard_is_loud(spark):
    """r11 dim-axis finding: cluster_profile against a dim-coupled
    oracle used to diverge SILENTLY on non-64 data (the r10 '0 silent
    FAIL' record had miscounted it). expect_dim now routes the loud
    train_centroids guard through the training pass; the well-formed
    path is unchanged."""
    import pytest

    from streamtasks_spark.llmdata import similarity

    bad = spark.createDataFrame(
        [(i, [float(i + j) for j in range(32)]) for i in range(12)],
        "vec_id int, embedding array<double>",
    )
    with pytest.raises(Exception, match="dim 32 != configured dim 64"):
        similarity.cluster_profile(bad, n_cells=4, n_iters=1, expect_dim=64)
    ok = similarity.cluster_profile(
        bad, n_cells=4, n_iters=1, expect_dim=32
    )
    assert ok.count() > 0
