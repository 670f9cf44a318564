"""Distributed Lloyd's k-means over a Dataset."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _blob_table():
    rng = np.random.RandomState(7)
    # two tight blobs far apart; ids 0..1 land one in each blob so the
    # deterministic first-k init starts with one centroid per blob
    a = rng.normal(0.0, 0.05, size=(20, 8)) + np.r_[np.ones(4), np.zeros(4)]
    b = rng.normal(0.0, 0.05, size=(20, 8)) - np.r_[np.zeros(4), np.ones(4)]
    vecs = np.empty((40, 8))
    vecs[0::2] = a
    vecs[1::2] = b
    return pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32())),
    })


def test_kmeans_separates_blobs(ray_session):
    import ray.data

    from documentai_ray.stages.similarity import kmeans_assign, kmeans_fit

    ds = ray.data.from_arrow(_blob_table())
    C = kmeans_fit(ds, k=2, iters=3)
    assert C.shape == (2, 8)
    out = kmeans_assign(ds, C).to_pandas().set_index("vec_id")["cluster"]
    evens = set(out[out.index % 2 == 0])
    odds = set(out[out.index % 2 == 1])
    assert len(evens) == 1 and len(odds) == 1 and evens != odds


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data

    from documentai_ray.stages.similarity import kmeans_fit

    # 3 identical points, k=2: cluster 1 (init = same point) ties to
    # cluster 0 on every assignment -> cluster 1 goes empty and must keep
    # its previous centroid instead of dividing by zero
    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 2.0]] * 3, pa.list_(pa.float32())),
    })
    C = kmeans_fit(ray.data.from_arrow(t), k=2, iters=2)
    assert np.allclose(C, [[1.0, 2.0], [1.0, 2.0]])


def test_pq_fit_encode_subspace_separation(ray_session):
    import ray.data

    from documentai_ray.stages.similarity import pq_encode, pq_fit

    rng = np.random.RandomState(11)
    # 8-dim, m=2: first half clusters at ±1 on dims 0-3, second half at
    # ±1 on dims 4-7, independently
    n = 40
    a = rng.randint(0, 2, n)
    b = rng.randint(0, 2, n)
    vecs = np.zeros((n, 8))
    vecs[:, :4] = np.where(a[:, None] == 1, 1.0, -1.0)
    vecs[:, 4:] = np.where(b[:, None] == 1, 1.0, -1.0)
    vecs += rng.normal(0, 0.05, vecs.shape)
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": pa.array(vecs.tolist(), pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    books = pq_fit(ds, m=2, k=2, iters=3)
    assert len(books) == 2 and books[0].shape == (2, 4)
    out = pq_encode(ds, books).to_pandas().set_index("vec_id").sort_index()
    # codes must track the generating factors exactly (up to label swap)
    for col, factor in (("code_0", a), ("code_1", b)):
        codes = out[col].to_numpy()
        assert (codes == factor).all() or (codes == 1 - factor).all()


def test_kcenter_greedy_bruteforce_equivalence(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from documentai_ray.stages.similarity import kcenter_select

    rng = np.random.RandomState(7)
    X = np.vstack([rng.randn(30, 8) * 0.1 + c
                   for c in (np.zeros(8), np.ones(8) * 5,
                             np.ones(8) * -5, np.eye(8)[0] * 9)])
    ids = np.arange(len(X))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(X.tolist(),
                                        pa.list_(pa.float64()))})
    out = kcenter_select(ray.data.from_arrow(t).repartition(5),
                         k=4).to_pandas()

    # driver-side reference greedy
    sel = [0]
    for _ in range(3):
        d2 = np.min(((X[:, None, :] - X[sel][None, :, :]) ** 2).sum(-1), 1)
        best = np.lexsort((ids, -d2))[0]
        sel.append(int(best))
    assert out["vec_id"].tolist() == sel
    # one pick per planted cluster: max coverage
    assert len({int(i) // 30 for i in sel}) == 4
