"""Corpus-quality tier tests: Gopher repetition signals and the C4-style
rule filter against hand-computed Python models (SURVEY §5 model-based
style), plus rule-isolation cases where exactly one rule fires.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from streamtasks_spark.llmdata import quality


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _python_repetition(text):
    words = " ".join(text.lower().split()).split(" ")
    n = len(words)
    wc = Counter(words)
    bigrams = Counter(
        f"{words[i]} {words[i + 1]}" for i in range(n - 1)
    )
    return {
        "n_words": n,
        "n_unique_words": len(wc),
        "unique_word_ratio": round(len(wc) / n, 6),
        "dup_word_fraction": round(
            sum(c for c in wc.values() if c > 1) / n, 6
        ),
        "top_word_fraction": round(max(wc.values()) / n, 6),
        "top_bigram_fraction": round(
            max(bigrams.values()) / (n - 1), 6
        )
        if n >= 2
        else 0.0,
    }


def test_doc_repetition_matches_python_model(spark):
    texts = [
        "the cat sat on the mat the cat",
        "a a a a b",
        "unique words only here now",
        "x",  # single word: bigram fraction must be 0.0
        "go go go go go go",
        "  spaced\tout\n words  collapse   right ",
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in quality.doc_repetition(_mk_docs(spark, texts)).collect()
    }
    for i, t in enumerate(texts):
        exp = _python_repetition(t)
        got = out[i]
        for k, v in exp.items():
            assert got[k] == pytest.approx(v, abs=1e-9), (i, k, got[k], v)


def test_quality_filter_rule_isolation(spark):
    stop_pad = "the a of to in is it for on and"  # 10 stopwords
    good = f"{stop_pad} alpha beta gamma delta epsilon zeta eta theta"
    cases = {
        # too few words (< MIN_WORDS)
        "r_word_count": "the a of tiny",
        # words of length 1: avg word length < MIN_AVG_WORD_LEN
        "r_word_len": "a b c d e f g h i j k l m n o p q r s t the a of",
        # no stopwords at all
        "r_stopwords": "alpha beta gamma delta epsilon zeta eta theta iota "
        "kappa lambda mu",
        # one word repeated: unique ratio below MIN_UNIQUE_RATIO and top
        # word fraction above the cap (fires r_unique AND r_top_word);
        # 11 unique / 70 words = 0.157 < 0.2
        "r_unique": f"{stop_pad} " + " ".join(["spam"] * 60),
    }
    texts = [good] + list(cases.values())
    rows = {
        r["doc_id"]: r.asDict()
        for r in quality.quality_filter(_mk_docs(spark, texts)).collect()
    }
    assert rows[0]["keep"] == 1, rows[0]
    for idx, rule in enumerate(cases, start=1):
        assert rows[idx][rule] == 0, (rule, rows[idx])
        assert rows[idx]["keep"] == 0, (rule, rows[idx])
    # the r_word_len doc still has enough words and stopwords
    assert rows[2]["r_word_count"] == 1 and rows[2]["r_stopwords"] == 1


def test_quality_filter_flags_are_ints(spark):
    df = quality.quality_filter(_mk_docs(spark, ["the a of to in words"]))
    for name, dtype in df.dtypes:
        if name.startswith("r_") or name == "keep":
            assert dtype == "int", (name, dtype)


def test_source_stats_aggregates_keep_rate(spark):
    stop_pad = "the a of to in is it for on and"
    good = f"{stop_pad} alpha beta gamma delta"
    bad = "alpha beta gamma delta epsilon zeta eta theta iota kappa mu nu"
    df = spark.createDataFrame(
        [
            (0, good, "s0"),
            (1, good, "s0"),
            (2, bad, "s0"),
            (3, bad, "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r["source"]: r.asDict()
        for r in quality.source_stats(df).collect()
    }
    assert out["s0"]["n_docs"] == 3 and out["s0"]["n_kept"] == 2
    assert out["s0"]["keep_rate"] == pytest.approx(round(2 / 3, 6))
    assert out["s1"]["n_docs"] == 1 and out["s1"]["n_kept"] == 0
    assert out["s1"]["keep_rate"] == 0.0


def test_quality_tier_is_shuffle_free_and_udf_free(spark):
    """doc_repetition / quality_filter must stay a narrow scan: no
    Exchange beyond the deliberate spread() repartition, no Python UDF
    (BatchEvalPython / ArrowEvalPython) anywhere in the plan."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (quality.doc_repetition, quality.quality_filter):
        plan = op(docs)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan, plan
        # exactly the one round-robin exchange from spread()
        assert plan.count("Exchange") == 1, plan
    plan = (
        quality.source_stats(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan, plan
    # spread() + the single groupBy shuffle; partial agg must be present
    assert plan.count("Exchange") == 2, plan
    assert "partial_count" in plan or "partial" in plan.lower(), plan


def test_dsir_weights_semantics_and_edges(spark):
    """DSIR (r08): docs made of target-domain tokens outweigh docs made
    of raw-domain tokens; a doc mixing both sits between; NULL text →
    all-NULL row; zero-token doc → n_tokens 0 with NULL masses; and
    smoothing keeps every tokenized doc's weight finite and positive."""
    rows = [
        # target domain: "alpha beta" vocabulary
        (0, "alpha beta alpha beta alpha", "t"),
        (1, "beta alpha beta", "t"),
        # raw domain: "zeta eta" vocabulary
        (2, "zeta eta zeta eta zeta", "r"),
        (3, "eta zeta eta", "r"),
        # score targets: pure-target text, pure-raw text, mixed
        (4, "alpha beta alpha", "r"),
        (5, "zeta eta zeta", "r"),
        (6, "alpha zeta", "r"),
        (7, None, "r"), (8, "", "r"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = {
        r["doc_id"]: r
        # 256 buckets: the four test tokens hash collision-free there
        # (beta/zeta collide at 64 — verified; a collision is legal,
        # it just blurs the separation this test asserts)
        for r in quality.dsir_weights(
            docs, target_pred="dom = 't'", n_buckets=256
        ).collect()
    }
    assert out[4]["weight"] > out[6]["weight"] > out[5]["weight"]
    assert out[4]["weight"] > 1.0 > out[5]["weight"]
    assert out[7]["n_tokens"] is None and out[7]["weight"] is None
    assert out[8]["n_tokens"] == 0 and out[8]["weight"] is None
    for d in (0, 1, 2, 3, 4, 5, 6):
        assert out[d]["weight"] is not None and out[d]["weight"] > 0.0
        assert out[d]["raw_mass"] >= out[d]["n_tokens"]  # add-one floor


def test_dsir_weights_oracle_on_duplicate_and_null_ids(spark):
    """The dsir oracle inherits unigram_lm's id contract: duplicated
    ids merge token streams (NULL member NULLs the row), a NULL id is
    one real scored group (NULL-safe final join) — bit-equal frames."""
    import duckdb
    import numpy as np

    rows = [
        (7, "alpha beta", "t"), (7, None, "t"),
        (8, "alpha alpha zeta", "r"), (8, "zeta eta", "r"),
        (9, "beta", "t"), (10, "", "r"),
        (None, "alpha zeta eta", "r"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    sdf = (
        quality.dsir_weights(docs, target_pred="dom = 't'", n_buckets=32)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR, dom VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    odf = (
        con.execute(quality.oracle_dsir_weights_sql(
            source_sql="SELECT doc_id, text, dom FROM d",
            target_pred="dom = 't'", n_buckets=32,
        ))
        .df().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == 5 == len(odf)
    for c in sdf.columns:
        a = sdf[c].to_numpy(dtype="float64")
        b = odf[c].to_numpy(dtype="float64")
        both_nan = np.isnan(a) & np.isnan(b)
        assert ((a == b) | both_nan).all(), (c, a, b)
    # id 7 NULLed by its NULL member; id 8 merged (5 tokens); the
    # NULL-id group carries real masses
    m = {(r if r == r else None): t for r, t in zip(sdf["doc_id"], sdf["n_tokens"])}
    assert np.isnan(m[7.0])
    assert m[8.0] == 5
    assert sdf.iloc[-1]["n_tokens"] == 3


def test_importance_resample_coin_and_edges(spark):
    """The DSIR selection step (NEW r09): the kept set is exactly
    {i : u_i < min(1, rate·w_i)} with u_i the md5-28-bit coin —
    recomputed here independently with hashlib; unscorable docs (NULL
    text, zero tokens) and NULL ids are never sampled; rate is
    monotone (kept sets nest); a huge rate keeps every scorable doc;
    a different salt draws a different (here: provably independent
    membership) sample while keeping weights identical."""
    import hashlib

    from streamtasks_spark.llmdata import quality

    docs = spark.createDataFrame(
        [(i, ("en " if i % 3 else "de ") + f"tok{i % 11} w{i % 5} cat",
          "en" if i % 3 else "de")
         for i in range(120)]
        + [(200, None, "en"), (201, "", "en"), (None, "en en cat", "en")],
        "doc_id long, text string, lang string",
    )

    def kept(rate, salt="resample"):
        return {
            r["doc_id"]: r
            for r in quality.importance_resample(
                docs, target_pred="lang = 'en'", n_buckets=64,
                rate=rate, salt=salt,
            ).collect()
        }

    w = {
        r["doc_id"]: r["weight"]
        for r in quality.dsir_weights(
            docs, target_pred="lang = 'en'", n_buckets=64
        ).collect()
        if r["weight"] is not None and r["doc_id"] is not None
    }
    got = kept(0.5)
    expected = set()
    for i, wi in w.items():
        u = int(
            hashlib.md5(f"resample-{i}".encode()).hexdigest()[:7], 16
        ) / float(1 << 28)
        if u < min(1.0, 0.5 * wi):
            expected.add(i)
    assert set(got) == expected and expected
    # the audit columns let the decision be replayed
    for i, r in got.items():
        assert r["u"] < r["p_keep"] <= 1.0
        assert r["weight"] == w[i]
    # edges: NULL text / empty text / NULL id never sampled
    assert kept(1e9).keys() == set(w)
    assert not {200, 201, None} & set(kept(1e9))
    # monotone in rate
    assert set(kept(0.25)) <= set(kept(0.5)) <= set(kept(1.0))
    # salt independence: same weights, different membership
    other = kept(0.5, salt="resample-b")
    assert set(other) != set(got)
    both = set(other) & set(got)
    assert all(other[i]["weight"] == got[i]["weight"] for i in both)
