#!/usr/bin/env python
"""Deterministic CPU-bound-scale corpus for hot-family A/Bs (r12 —
VERDICT r11 item 5).

sf0.1 is scheduler/fixed-cost bound (the 8-core full bench BEATS the
32-core one), so plan improvements in the ANN/dedup/ngram families no
longer move its wall clock. This writes a bigger corpus with the same
schemas — embeddings (dim 64) and documents with controlled near-dup
structure — plus symlinks to the sf0.1 TPC-H tables, so any declared
query runs against it via `bench.py <dir> <query ...>`.

Everything derives from xxhash64 of the row id — no RNG, no
Date.now(): re-running produces byte-identical tables. NOT part of the
driver contract; local profiling input only (the driver benches
/root/testdata/sf0.1).

Usage: python scripts/gen_scale_data.py [out_dir] [--vecs=100000] [--docs=100000]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streamtasks_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"


def main() -> int:
    out = "/root/bigdata/sfbig"
    n_vecs = 100_000
    n_docs = 100_000
    for a in sys.argv[1:]:
        if a.startswith("--vecs="):
            n_vecs = int(a.split("=", 1)[1])
        elif a.startswith("--docs="):
            n_docs = int(a.split("=", 1)[1])
        elif not a.startswith("-"):
            out = a
    os.makedirs(out, exist_ok=True)
    spark = get_spark("gen_scale_data")

    # embeddings: 64 deterministic floats in ~[-0.3, 0.3] per id —
    # same shape/dtype as the driver's table (float array + int label)
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> cast("
            "  cast(pmod(xxhash64(id * 64 + i), 600001) - 300000 as double)"
            "  / 1000000.0 as float))"
        ).alias("embedding"),
        F.expr("cast(pmod(xxhash64(id, 7), 8) as int)").alias("label"),
    )
    emb.repartition(32).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    # documents: 40-240 tokens from a 64-word vocab keyed by hash;
    # every 10th doc is a near-copy of the previous block's doc (one
    # token perturbed) so dedup/ngram families see realistic pair rates
    vocab = (
        "batch part spark line column order small sort query agg scan "
        "fast vector table join group shuffle hash merge read write "
        "cache disk memory task stage job plan code gen filter push "
        "down key value row set list map array struct text token char "
        "word doc page site link node edge graph tree leaf root path "
        "range bound limit skew salt probe build"
    ).split()
    arr = "array(" + ", ".join(f"'{w}'" for w in vocab) + ")"
    base_expr = (
        f"array_join(transform(sequence(1, 40 + cast(pmod(xxhash64(__src), 201) as int)), "
        f"i -> element_at({arr}, cast(pmod(xxhash64(__src * 1024 + i), {len(vocab)}) as int) + 1)), ' ')"
    )
    docs = (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            # near-dup structure: ids ≡ 9 (mod 10) reuse the seed of
            # (id - 1) so their text matches it except the appended tag
            F.expr("if(pmod(id, 10) = 9, id - 1, id)").alias("__src"),
        )
        .select(
            "doc_id",
            F.expr(
                f"if(pmod(doc_id, 10) = 9, concat({base_expr}, ' tail'), "
                f"{base_expr})"
            ).alias("text"),
            F.expr(
                "element_at(array('en','zh','de','fr'), "
                "cast(pmod(xxhash64(doc_id, 3), 4) as int) + 1)"
            ).alias("lang"),
            F.expr(
                "concat('src', cast(pmod(xxhash64(doc_id, 5), 4) as string))"
            ).alias("source"),
        )
        .withColumn("n_chars", F.length("text"))
    )
    docs.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    # TPC-H + events tables ride along from sf0.1 (symlinks) so every
    # declared query resolves against this dir
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    print(f"wrote {out}: embeddings={n_vecs} documents={n_docs}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
