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
