"""Exact brute-force kNN and recall evaluation (NumPy).

Reference behavior: the upstream repo evaluates recall against brute-force exact
kNN (SURVEY.md §3.5, §4).  This module is the ground-truth side of that harness.
"""

from __future__ import annotations

import numpy as np


def pairwise_distances(queries: np.ndarray, data: np.ndarray, metric: str) -> np.ndarray:
    """Full distance matrix [Q, N] under the given metric.

    Metrics follow the hnswlib convention (SURVEY.md §1 L0): "l2" is *squared*
    Euclidean, "ip" is 1 - <q, x>, "cosine" is 1 - cos(q, x).
    """
    queries = np.asarray(queries, dtype=np.float32)
    data = np.asarray(data, dtype=np.float32)
    if metric == "l2":
        qn = np.sum(queries * queries, axis=1, keepdims=True)
        xn = np.sum(data * data, axis=1, keepdims=True)
        d = qn - 2.0 * (queries @ data.T) + xn.T
        return np.maximum(d, 0.0)
    if metric == "ip":
        return 1.0 - queries @ data.T
    if metric == "cosine":
        qn = np.linalg.norm(queries, axis=1, keepdims=True)
        xn = np.linalg.norm(data, axis=1, keepdims=True)
        qn = np.where(qn == 0, 1.0, qn)
        xn = np.where(xn == 0, 1.0, xn)
        return 1.0 - (queries / qn) @ (data / xn).T
    # registry metrics: per-query pair_dist rows (NumPy side of the functor)
    from ocaml_hnsw_tpu.ops.metrics import get_metric

    m = get_metric(metric)
    if m.normalize_add:
        xn = np.linalg.norm(data, axis=1, keepdims=True)
        data = data / np.where(xn == 0, 1.0, xn)
    if m.normalize_query:
        qn = np.linalg.norm(queries, axis=1, keepdims=True)
        queries = queries / np.where(qn == 0, 1.0, qn)
    out = np.empty((queries.shape[0], data.shape[0]), np.float32)
    for i, q in enumerate(queries):
        out[i] = m.pair_dist_np(data, q)
    return out


def bruteforce_knn(
    data: np.ndarray, queries: np.ndarray, k: int, metric: str = "l2"
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN: returns (ids[Q, k], dists[Q, k]) sorted ascending by distance."""
    d = pairwise_distances(queries, data, metric)
    k = min(k, d.shape[1])
    part = np.argpartition(d, k - 1, axis=1)[:, :k]
    pd = np.take_along_axis(d, part, axis=1)
    order = np.argsort(pd, axis=1, kind="stable")
    ids = np.take_along_axis(part, order, axis=1)
    return ids.astype(np.int64), np.take_along_axis(pd, order, axis=1)


def recall(found_ids: np.ndarray, true_ids: np.ndarray) -> float:
    """recall@k = |found ∩ true| / (k * Q)  (ann-benchmarks protocol, SURVEY.md §3.5)."""
    found_ids = np.asarray(found_ids)
    true_ids = np.asarray(true_ids)
    assert found_ids.shape[0] == true_ids.shape[0]
    k = true_ids.shape[1]
    hits = 0
    for f, t in zip(found_ids, true_ids):
        hits += len(set(f.tolist()) & set(t.tolist()))
    return hits / (k * true_ids.shape[0])
