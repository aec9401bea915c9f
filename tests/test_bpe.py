"""BPE tokenizer tier: randomized python-model agreement + mechanics.

Cross-engine agreement (the oracle gate) can't catch both engines
agreeing on the WRONG semantics — these tests pin the learner against a
pure-python reference implementation of Sennrich-style BPE (dict-based
get_stats/merge_vocab, the published algorithm) over seeded random
corpora built to stress the delimited-replace fuse: consecutive
same-symbol runs (the non-overlapping left-to-right case), '~' and
'</w>'-looking characters in raw text (delimiter/marker collision
probes), punctuation and non-ASCII atomics, empty/None documents, and
vocabularies small enough to exhaust merges (the early stop).
"""

from __future__ import annotations

import collections
import random
import re

import pytest

from streamtasks_spark.llmdata import bpe

WORD_RE = re.compile(r"[a-z0-9_]+$")


def _norm(t):
    if t is None:
        return ""
    return re.sub(r"\s+", " ", t.lower()).strip()


def _toks(t):
    return re.findall(r"[a-z0-9_]+|[^a-z0-9_ ]", _norm(t))


def py_bpe(texts, n_merges=10, min_freq=2):
    """Reference learner: returns (merge rows, final word→symbols)."""
    freqs = collections.Counter(
        w for t in texts for w in _toks(t) if WORD_RE.match(w)
    )
    vocab = {tuple(list(w) + ["</w>"]): f for w, f in freqs.items()}
    words = {tuple(list(w) + ["</w>"]): w for w in freqs}
    merges = []
    for t in range(1, n_merges + 1):
        pc = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        cand = [(c, p) for p, c in pc.items() if c >= min_freq]
        if not cand:
            break
        cnt, (x, y) = sorted(
            cand, key=lambda cp: (-cp[0], cp[1][0], cp[1][1])
        )[0]
        merges.append((t, x, y, x + y, cnt))
        nv, nw = {}, {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + f
            nw[tuple(out)] = words[syms]
        vocab, words = nv, nw
    return merges, {w: list(s) for s, w in words.items()}


def py_counts(texts, wsyms):
    rows = []
    for i, t in enumerate(texts):
        ts = _toks(t)
        if not ts:
            continue
        nw = sum(1 for w in ts if WORD_RE.match(w))
        nb = sum(len(wsyms[w]) if WORD_RE.match(w) else 1 for w in ts)
        rows.append((i, len(ts), nw, nb))
    return rows


def _rand_texts(seed, n_docs=24):
    """Seeded hostile corpus: tiny alphabet (forces deep merge chains
    and same-symbol runs), delimiter/marker probe characters, unicode
    atomics, degenerate documents."""
    rng = random.Random(seed)
    alpha = "ab0_"
    words = [
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
        for _ in range(10)
    ] + ["aaaa", "aaa", "aa"]
    junk = [",", ".", "!", "~", "<", "/", ">", "é", "—", "</w>"]
    texts = []
    for _ in range(n_docs):
        parts = [
            rng.choice(words if rng.random() < 0.8 else junk)
            for _ in range(rng.randint(0, 12))
        ]
        texts.append(rng.choice([" ", "  ", "\t"]).join(parts))
    texts += [None, "", "   \t\n ", "~~a~~ ~b~", "</w> w w w"]
    return texts


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# mlv: None = driver-local fit (the size-gated default), 0 = the
# distributed learner forced — both paths must match the reference
@pytest.mark.parametrize("seed", [11, 97, 5003])
@pytest.mark.parametrize("mlv", [None, 0])
def test_bpe_train_matches_python_model(spark, seed, mlv):
    texts = _rand_texts(seed)
    pym, _ = py_bpe(texts, n_merges=8, min_freq=2)
    got = [
        tuple(r)
        for r in bpe.bpe_train(
            _docs_df(spark, texts), n_merges=8, min_freq=2,
            max_local_vocab=mlv,
        ).collect()
    ]
    assert got == pym


@pytest.mark.parametrize("seed", [13, 5003])
@pytest.mark.parametrize("mlv", [None, 0])
def test_bpe_token_count_matches_python_model(spark, seed, mlv):
    texts = _rand_texts(seed)
    pym, wsyms = py_bpe(texts, n_merges=8, min_freq=2)
    exp = py_counts(texts, wsyms)
    got = [
        tuple(r)
        for r in bpe.bpe_token_count(
            _docs_df(spark, texts), n_merges=8, min_freq=2,
            max_local_vocab=mlv,
        ).collect()
    ]
    assert got == exp


@pytest.mark.parametrize("seed", [29, 5003])
def test_bpe_oracle_sql_matches_python_model(spark, seed):
    """The DuckDB twin reproduces the reference learner on the same
    hostile corpus — beyond the driver's fixed-corpus gate."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    texts = _rand_texts(seed)
    pym, wsyms = py_bpe(texts, n_merges=8, min_freq=2)
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    dm = con.execute(
        bpe.oracle_bpe_train_sql(n_merges=8, min_freq=2)
    ).fetchall()
    assert [tuple(r) for r in dm] == pym
    dc = con.execute(
        bpe.oracle_bpe_token_count_sql(n_merges=8, min_freq=2)
    ).fetchall()
    assert [tuple(r) for r in dc] == py_counts(texts, wsyms)


def test_consecutive_run_fuse(spark):
    """'aaaa' under an (a,a) merge must become (aa, aa, </w>) — the
    left-to-right non-overlapping fuse the double-delimiter encoding
    guarantees (a naive single-space encoding gets (aa, a, a) here)."""
    texts = ["aaaa aaaa aaaa"]
    m = bpe.bpe_train(_docs_df(spark, texts), n_merges=1, min_freq=2).collect()
    assert [(r["x"], r["y"], r["cnt"]) for r in m] == [("a", "a", 9)]
    enc = bpe.bpe_encode(
        _docs_df(spark, texts),
        bpe.bpe_train(_docs_df(spark, texts), n_merges=1, min_freq=2),
    ).collect()
    assert enc[0]["bpe_tokens"] == ["aa", "aa", "</w>"] * 3


def test_early_stop_ranks_contiguous(spark):
    """A vocabulary that exhausts pairs stops early: fewer rows than
    n_merges, ranks 1..k with no gaps."""
    texts = ["ab ab", "cd"]
    m = bpe.bpe_train(
        _docs_df(spark, texts), n_merges=10, min_freq=2
    ).collect()
    assert [r["merge_rank"] for r in m] == list(range(1, len(m) + 1))
    assert 0 < len(m) < 10
    assert all(r["cnt"] >= 2 for r in m)


def test_encode_matches_token_count_and_is_monotone(spark):
    """encode(train(C)) sizes equal bpe_token_count(C); truncating the
    merge table can only grow token counts (fewer fuses)."""
    texts = _rand_texts(41, n_docs=12)
    docs = _docs_df(spark, texts)
    merges = bpe.bpe_train(docs, n_merges=8, min_freq=2)
    full = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    counted = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_token_count(docs, n_merges=8, min_freq=2).collect()
    }
    assert full == counted
    half = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe.bpe_encode(
            docs, merges.filter("merge_rank <= 3")
        ).collect()
    }
    assert all(half[k] >= full[k] for k in full)


def test_encode_unseen_words_fuse_partially(spark):
    """Open-vocabulary: encoding a corpus disjoint from training fuses
    as far as the learned merges reach, atomics stay atomic."""
    train = _docs_df(spark, ["low low lower lower"])
    merges = bpe.bpe_train(train, n_merges=3, min_freq=2)
    got = bpe.bpe_encode(
        _docs_df(spark, ["lowest ! zz"]), merges
    ).collect()[0]
    toks = got["bpe_tokens"]
    # word tokens carry the </w> marker, the '!' atomic does not
    assert "".join(toks) == "lowest</w>" + "!" + "zz</w>"
    # the learned 'lo'/'low' prefixes apply to the unseen word
    assert toks[0] in ("lo", "low")
    assert "!" in toks and got["n_bpe_tokens"] == len(toks)


@pytest.mark.parametrize("seed", [71])
@pytest.mark.parametrize("mlv", [None, 0])
def test_bpe_vocab_matches_python_model(spark, seed, mlv):
    texts = _rand_texts(seed, n_docs=16)
    freqs = collections.Counter(
        w for t in texts for w in _toks(t) if WORD_RE.match(w)
    )
    _, wsyms = py_bpe(texts, n_merges=6, min_freq=2)
    exp = sorted(
        (w, freqs[w], len(s), " ".join(s)) for w, s in wsyms.items()
    )
    got = [
        tuple(r)
        for r in bpe.bpe_vocab(
            _docs_df(spark, texts), n_merges=6, min_freq=2,
            max_local_vocab=mlv,
        ).collect()
    ]
    assert got == exp


@pytest.mark.parametrize("seed", [59])
@pytest.mark.parametrize("mlv", [None, 0])
def test_bpe_fertility_matches_python_model(spark, seed, mlv):
    """Per-group fertility: exact integer micro-unit floor division,
    NULL groups ordered last in both engines."""
    texts = _rand_texts(seed, n_docs=16)
    _, wsyms = py_bpe(texts, n_merges=6, min_freq=2)
    groups = ["s1", "s2", None] * ((len(texts) + 2) // 3)
    agg = {}
    for i, t in enumerate(texts):
        g = groups[i]
        ws = [w for w in _toks(t) if WORD_RE.match(w)]
        if not ws:
            continue
        d, nw, ns = agg.get(g, (set(), 0, 0))
        agg[g] = (d | {i}, nw + len(ws), ns + sum(len(wsyms[w]) for w in ws))
    exp = sorted(
        (
            (g, len(d), nw, ns, ns * 1_000_000 // nw)
            for g, (d, nw, ns) in agg.items()
        ),
        key=lambda r: (r[0] is None, r[0]),
    )
    docs = spark.createDataFrame(
        [(i, t, groups[i]) for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    got = [
        tuple(r)
        for r in bpe.bpe_fertility(
            docs, n_merges=6, min_freq=2, max_local_vocab=mlv
        ).collect()
    ]
    assert got == exp
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "source": groups[: len(texts)],
            }
        ),
    )
    dm = con.execute(
        bpe.oracle_bpe_fertility_sql(n_merges=6, min_freq=2)
    ).fetchall()
    assert [tuple(r) for r in dm] == exp


def test_save_load_merges_roundtrip_and_crash_at_flip(
    spark, tmp_path, monkeypatch
):
    """The persisted tokenizer artifact commits through the manifest
    protocol: a crash between segment write and pointer flip leaves
    the PREVIOUS merge table live (a half-written table would silently
    change every downstream token count), and encoding with the loaded
    table equals encoding with the in-memory one."""
    from streamtasks_spark.core import state

    texts = ["low lower lowest", "low lower newest"] * 3
    docs = _docs_df(spark, texts)
    merges = bpe.bpe_train(docs, n_merges=4, min_freq=2)
    p = str(tmp_path / "tok")
    bpe.save_merges(merges, p)
    loaded = bpe.load_merges(spark, p)
    assert [tuple(r) for r in loaded.collect()] == [
        tuple(r) for r in merges.collect()
    ]
    enc_mem = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs, merges).collect()
    }
    enc_disk = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe.bpe_encode(docs, loaded).collect()
    }
    assert enc_mem == enc_disk

    # crash at the flip while committing a RETRAINED table
    orig = state._flip
    calls = {"n": 0}

    def flip(tmp, dst):
        calls["n"] += 1
        raise RuntimeError("injected crash at flip")

    monkeypatch.setattr(state, "_flip", flip)
    with pytest.raises(RuntimeError, match="injected"):
        bpe.save_merges(
            bpe.bpe_train(docs, n_merges=2, min_freq=2), p
        )
    monkeypatch.setattr(state, "_flip", orig)
    assert calls["n"] == 1
    assert [tuple(r) for r in bpe.load_merges(spark, p).collect()] == [
        tuple(r) for r in merges.collect()
    ]
    with pytest.raises(ValueError, match="no committed"):
        bpe.load_merges(spark, str(tmp_path / "empty"))


def test_token_count_plan_shape(spark):
    """Vocabulary join is broadcast; nothing row-Python anywhere."""
    docs = _docs_df(spark, ["the cat sat on the mat"] * 4)
    plan = bpe.bpe_token_count(
        docs, n_merges=2, min_freq=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
