#!/usr/bin/env python
"""The 100 TB training-data path, end to end at sf0.001: quality rules
→ near-dup classes → decontamination → split assignment → deterministic
global shuffle → size-managed sharded parquet output.

Every stage is the scale-shaped operator (banded LSH, broadcast drop
lists, per-shard shuffle windows) — this script just composes them the
way a production corpus build would.

Run: python examples/corpus_pipeline.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streamtasks_spark.core.dataset import shuffle_shards, write_dataset
from streamtasks_spark.llmdata.bpe import (
    bpe_token_count,
    bpe_train,
    save_merges,
)
from streamtasks_spark.llmdata.dedup import (
    connected_components,
    dedup_minhash,
    paragraph_dedup,
)
from streamtasks_spark.llmdata.pipeline import (
    corpus_prepare,
    decontaminate,
    split_assign,
)
from streamtasks_spark.llmdata.quality import quality_filter
from streamtasks_spark.llmdata.similarity import (
    cluster_profile,
    cluster_prune,
    train_centroids,
)
from streamtasks_spark.session import get_spark, read_parquet


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("example_corpus")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # 0. paragraph-level boilerplate scrub (C4/RefinedWeb run this
    # FIRST: repeated footers/nav-blocks would otherwise drag every
    # page's shingle set toward its site template and blunt the
    # near-dup stage). The testdata is single-paragraph, so simulate
    # the crawl reality by appending a per-source footer, then let
    # paragraph_dedup keep each distinct paragraph once corpus-wide.
    crawl = docs.withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit("\n\nfollow "), F.col("source"),
            F.lit(" for more updates"),
        ),
    )
    scrubbed = paragraph_dedup(crawl)
    n_boiler = scrubbed.agg(
        F.sum(F.col("n_paras") - F.col("n_kept"))
    ).collect()[0][0]
    docs = (
        docs.drop("text", "n_chars")
        .join(scrubbed.filter(F.col("n_kept") > 0), "doc_id")
        .select(
            "doc_id", F.col("text_kept").alias("text"), "lang", "source",
            F.length("text_kept").alias("n_chars"),
        )
    )
    print(f"paragraph scrub removed {n_boiler} duplicate paragraphs")

    # 1. quality rules (one scan, inline expressions; quality_filter
    # emits per-rule 0/1 flags + keep, keyed by doc_id)
    keep_ids = quality_filter(docs).filter(F.col("keep") == 1).select("doc_id")
    kept = docs.join(keep_ids, "doc_id", "left_semi")

    # 2. near-dup classes: keep one canonical doc per class
    comp = connected_components(dedup_minhash(kept, threshold=0.5))
    dups = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = kept.join(F.broadcast(dups), "doc_id", "left_anti")

    # 3. decontamination vs a held-out eval set (here: a synthetic slice)
    eval_docs = docs.filter(F.col("doc_id") % 25 == 7)
    contaminated = decontaminate(kept, eval_docs).select("doc_id")
    kept = kept.join(F.broadcast(contaminated), "doc_id", "left_anti")

    # 3.5 D4-style embedding-space curation (r10): train the codebook
    # once, READ the per-cluster profile (what a human/policy layer
    # would inspect to pick rates), PRUNE with per-cluster keep rates
    # derived from tightness, and drop the pruned docs from the corpus
    # (vec_id keys the same documents). The per-(source, split) report
    # of the surviving corpus then comes from corpus_prepare — the
    # profile -> prune -> prepare loop as one pipeline.
    vecs = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    cents = train_centroids(vecs, n_cells=8, n_iters=3)
    profile = cluster_profile(vecs, centroids=cents)
    print("cluster profile (tightness drives the keep rate):")
    for r in profile.orderBy("cell").collect():
        print(f"  cell {r['cell']}: {r['n_members']} members, "
              f"avg_cos={r['avg_cos']:.4f}")
    pruned = (
        cluster_prune(vecs, centroids=cents, rate_floor=0.5, rate_ceil=0.95)
        .filter(~F.col("keep"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    n_pruned = pruned.count()
    kept = kept.join(F.broadcast(pruned), "doc_id", "left_anti")
    report = corpus_prepare(kept, eval_docs)
    print(f"D4 prune dropped {n_pruned} prototypical docs; "
          "per-(source, split) report of the survivors:")
    for r in report.orderBy("source", "split").limit(6).collect():
        print(f"  {r['source']}/{r['split']}: kept {r['n_kept']}")

    # 3.8 token-budget accounting (r11): train the tokenizer ON the
    # surviving corpus and price it in ITS OWN subword tokens — the
    # number a compute plan actually consumes (a whitespace estimate
    # drifts 20-40% from the trained-tokenizer figure). The merge
    # table is the artifact a production run would persist next to
    # the dataset manifest.
    merges = bpe_train(kept, n_merges=10, min_freq=2)
    budget = bpe_token_count(kept, n_merges=10, min_freq=2).agg(
        F.sum("n_bpe_tokens").alias("total"),
        F.sum("n_tokens").alias("words"),
    ).collect()[0]
    print(f"token budget: {budget['total']} BPE subword tokens "
          f"over {budget['words']} word-level tokens, under "
          f"{merges.count()} learned merges")

    # 4. deterministic split + global shuffle + sharded write; the
    # tokenizer commits beside the dataset through the same
    # versioned-manifest protocol (a half-written merge table would
    # silently re-price the corpus)
    kept = split_assign(kept, carry=("text", "lang", "source", "n_chars"))
    train = kept.filter(F.col("split") == "train").drop("split")
    addressed = shuffle_shards(
        train, id_cols=["doc_id"], n_shards=8, seed=42
    )

    td = tempfile.TemporaryDirectory(prefix="corpus_out_")
    out = out_dir or td.name
    save_merges(merges, f"{out}/tokenizer")
    manifest = write_dataset(
        addressed, f"{out}/train",
        partition_by=["shard"], sort_within=["pos"], target_file_mb=64,
    )

    back = spark.read.parquet(f"{out}/train")
    n_train = back.count()
    print(f"docs in: {n0}")
    print(f"after quality+dedup+decontam: {kept.count()}")
    print(f"train shard files written: {manifest['n_shards']} shards, "
          f"{n_train} docs, est {manifest['est_bytes']} bytes")
    assert n_train > 0 and back.select("shard").distinct().count() <= 8
    print("ok")


if __name__ == "__main__":
    main()
