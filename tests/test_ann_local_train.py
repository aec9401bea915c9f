"""Both-paths sweeps for the r11 driver-local ANN training fast path.

``train_centroids`` (spherical k-means) and ``_pq_train`` (per-subspace
PQ k-means) gained a size-gated driver-local twin
(:data:`similarity._ANN_MAX_LOCAL_TRAIN`): corpora at or under the gate
are pulled once and the Lloyd loops run in-process with zero further
Spark jobs. The twin claims BIT-identity with the distributed loop —
same IEEE left-to-right folds, same exact integer micro-unit sums, same
struct-comparator tie-breaks — so these tests compare the two paths at
float-bit resolution (``float.hex`` distinguishes -0.0 and NaN payloads
where ``==`` does not) over hostile corpora: zero-norm / NULL / NaN /
Inf vectors, NULL ids, ragged dims, components beyond the ±2^20 clamp,
empty corpora, unseedable corpora, and the numpy-vs-scalar twin pair.
"""

from __future__ import annotations

import math
import random
import sys

import pytest

from streamtasks_spark.llmdata import similarity as sim


def _hx(x):
    return x.hex() if isinstance(x, float) else x


def _vec_rows(seed, n=40, dim=8, ragged=False, huge=False):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        d = dim if not ragged else rng.choice([dim, dim - 2, dim + 3])
        v = [rng.uniform(-2.0, 2.0) for _ in range(d)]
        if huge and rng.random() < 0.25:
            # straddle the ±2^20 integer-clamp boundary exactly
            v[0] = rng.choice(
                [1048576.0, -1048576.0, 1048577.5, -2500000.25, 3.5e6]
            )
        rows.append((i, v))
    rows += [
        (n, [0.0] * dim),                              # zero norm: dropped
        (n + 1, None),                                 # NULL vector: dropped
        (None, [1.0] * dim),                           # NULL id: assigned,
        #                                                never seeds
        (n + 2, [float("nan")] + [1.0] * (dim - 1)),   # NaN: dropped
        (n + 3, [float("inf")] + [1.0] * (dim - 1)),   # Inf: dropped
    ]
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _centroids_bits(df):
    return sorted(
        (r["__cell"], tuple(_hx(x) for x in r["__cv"]), _hx(r["__cn"]))
        for r in df.collect()
    )


def _cb_bits(cb):
    cents, cint = cb
    return (
        {
            m: {j: tuple(_hx(x) for x in cv) for j, cv in cents[m].items()}
            for m in cents
        },
        cint,
    )


@pytest.mark.parametrize("seed", [11, 97, 5003])
@pytest.mark.parametrize("kind", ["plain", "ragged", "huge"])
def test_train_centroids_paths_bit_equal(spark, monkeypatch, seed, kind):
    rows = _vec_rows(
        seed, ragged=(kind == "ragged"), huge=(kind == "huge")
    )
    out = {}
    for label, gate in (("local", 1 << 20), ("dist", 0)):
        monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", gate)
        out[label] = _centroids_bits(
            sim.train_centroids(
                _df(spark, rows), n_cells=5, n_iters=3
            )
        )
    assert out["local"] == out["dist"]


@pytest.mark.parametrize("seed", [13, 5003])
@pytest.mark.parametrize("kind", ["plain", "huge"])
def test_pq_codebooks_paths_bit_equal(spark, monkeypatch, seed, kind):
    rows = _vec_rows(seed, dim=8, huge=(kind == "huge"))
    out = {}
    for label, gate in (("local", 1 << 20), ("dist", 0)):
        monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", gate)
        out[label] = _cb_bits(
            sim.train_pq_codebooks(
                _df(spark, rows), dim=8, m_sub=4, n_codes=4, n_iters=2
            )
        )
    assert out["local"] == out["dist"]


def test_gate_boundary_row_counts(spark, monkeypatch):
    """len(pulled) == gate takes the local path; gate+1 falls through
    to the distributed loop — and both agree bit-for-bit either way."""
    rows = [(i, [float(i % 7) + 0.5, float(i % 3) - 1.25]) for i in range(9)]
    df = _df(spark, rows)
    res = {}
    for gate in (9, 8, 0):  # 9 surviving rows: local, distributed, forced-off
        monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", gate)
        res[gate] = _centroids_bits(
            sim.train_centroids(df, n_cells=3, n_iters=2)
        )
    assert res[9] == res[8] == res[0]


@pytest.mark.parametrize("gate", [1 << 20, 0])
def test_train_centroids_unseedable_raises_same(spark, monkeypatch, gate):
    monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", gate)
    # every id below n_cells is zero-norm -> no seeds, loud either path
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (7, [1.0, 2.0])]
    with pytest.raises(ValueError, match="no nonzero-norm vectors"):
        sim.train_centroids(_df(spark, rows), n_cells=2, n_iters=1)


@pytest.mark.parametrize("gate", [1 << 20, 0])
def test_pq_empty_corpus_empty_result(spark, monkeypatch, gate):
    monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", gate)
    cents = sim._pq_train(
        sim.pin(
            sim._with_norm(
                _df(spark, [(0, [0.0, 0.0])]).select("vec_id", "embedding"),
                "embedding",
            ).withColumn(
                "__nv", sim.F.expr("transform(__v, x -> x / __nrm)")
            )
        ),
        "vec_id", 2, 1, 2, 1,
    )
    assert cents == {}


def test_local_twin_numpy_and_scalar_agree(monkeypatch):
    """The vectorized (numpy) and scalar in-process twins are the same
    function: block numpy (only while the fit runs — pyspark itself
    needs it) and re-fit on plain tuples, comparing at bit resolution.
    Pure-driver test, no Spark session involved."""
    rng = random.Random(23)
    km_rows, pq_rows = [], []
    for i in range(30):
        v = [rng.uniform(-2.0, 2.0) for _ in range(8)]
        if rng.random() < 0.25:
            v[0] = rng.choice([1048576.0, -1048576.0, 2500000.25])
        nrm = math.sqrt(sim.sum_lr(x * x for x in v))
        km_rows.append((i, v, nrm))
        pq_rows.append((i, [x / nrm for x in v]))

    def fits():
        km = sim._kmeans_fit_local(km_rows, "vec_id", 4, 3)
        pq = sim._pq_fit_local(pq_rows, "vec_id", 8, 4, 4, 2)
        return (
            {c: tuple(_hx(x) for x in cv) for c, cv in km.items()},
            {
                m: {j: tuple(_hx(x) for x in cv) for j, cv in pq[m].items()}
                for m in pq
            },
        )

    with_np = fits()
    # None in sys.modules makes `import numpy` raise ImportError
    monkeypatch.setitem(sys.modules, "numpy", None)
    without_np = fits()
    assert with_np == without_np


@pytest.mark.parametrize("gate", [1 << 20, 0])
def test_ivf_trained_query_end_to_end_equal(spark, monkeypatch, gate):
    """End to end: a cosine top-k served from a trained codebook gives
    the same rows whichever path trained it."""
    rows = _vec_rows(41, n=32, dim=8)
    df = _df(spark, rows)
    monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", gate)
    cents = sim.train_centroids(df, n_cells=4, n_iters=2)
    got = sorted(
        tuple(_hx(v) for v in r)
        for r in sim.ivf_topk(
            df, df.filter("vec_id < 3"), k=5, centroids=cents
        ).collect()
    )
    monkeypatch.setattr(sim, "_ANN_MAX_LOCAL_TRAIN", 1 << 20)
    ref = sorted(
        tuple(_hx(v) for v in r)
        for r in sim.ivf_topk(
            df, df.filter("vec_id < 3"), k=5,
            centroids=sim.train_centroids(df, n_cells=4, n_iters=2),
        ).collect()
    )
    assert got == ref
