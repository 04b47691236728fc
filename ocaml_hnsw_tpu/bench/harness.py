"""Benchmark harness — the reference's L4 layer (SURVEY.md §1, §3.5):
ann-benchmarks-style protocol: build (timed), exact ground truth, recall@k
sweep over ef, QPS at the target recall.  Emits structured JSON per run
(SURVEY.md §5.5 metrics/observability).
"""

from __future__ import annotations

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.config import HnswConfig
from ocaml_hnsw_tpu.models.build import BuildState
from ocaml_hnsw_tpu.models.search import knn_search
from ocaml_hnsw_tpu.oracle.bruteforce import recall as recall_of
from ocaml_hnsw_tpu.bench import datasets


def device_ground_truth(data: np.ndarray, queries: np.ndarray, k: int,
                        metric: str, chunk: int = 256) -> np.ndarray:
    """Exact kNN on the accelerator, chunked over queries."""
    from ocaml_hnsw_tpu.api import _bf_knn

    x = jnp.asarray(data)
    deleted = jnp.zeros((data.shape[0],), jnp.bool_)
    out = []
    for i in range(0, queries.shape[0], chunk):
        qc = queries[i : i + chunk]
        pad = chunk - qc.shape[0]
        if pad:
            qc = np.pad(qc, ((0, pad), (0, 0)))
        ids, _ = _bf_knn(x, jnp.asarray(qc), deleted, k=k, metric=metric)
        out.append(np.asarray(ids)[: chunk - pad])
    return np.concatenate(out)


def measure_qps(graph, queries: np.ndarray, k: int, ef: int, metric: str,
                batch: int = 4096, warmup: int = 1, reps: int = 3) -> float:
    """Throughput of the batched search at a fixed ef (queries tiled to fill
    whole batches; jit warmed up first).

    Timing note: through the axon tunnel `block_until_ready` does NOT actually
    synchronize, so each measured call fetches one scalar to host — the TPU
    stream is in-order, so the fetch syncs everything enqueued before it."""
    q = queries
    while q.shape[0] < batch:
        q = np.concatenate([q, q])
    q = jnp.asarray(q[:batch])
    for _ in range(warmup):
        ids, _ = knn_search(graph, q, k=k, ef=ef, metric=metric)
        np.asarray(ids[0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        ids, _ = knn_search(graph, q, k=k, ef=ef, metric=metric)
    np.asarray(ids[0, 0])  # one sync at the end; stream is in-order
    dt = time.perf_counter() - t0
    return batch * reps / dt


def run_config(
    name: str,
    n: int,
    dim: int,
    metric: str,
    n_queries: int = 1000,
    k: int = 10,
    M: int = 16,
    ef_construction: int = 200,
    round_size: int = 1024,
    ef_sweep=(10, 16, 24, 32, 48, 64, 96, 128, 192, 256),
    target_recall: float = 0.95,
    qps_batch: int = 4096,
    seed: int = 7,
    verbose: bool = True,
) -> dict:
    """Full ann-benchmarks protocol on a synthetic stand-in dataset."""

    def log(msg):
        if verbose:
            print(f"[bench:{name}] {msg}", flush=True)

    data = datasets.clustered(n, dim, n_clusters=max(64, n // 2500), seed=seed)
    queries = datasets.queries_like(data, n_queries, seed=seed + 1)
    cfg = HnswConfig(dim=dim, metric=metric, M=M,
                     ef_construction=ef_construction)
    log(f"building: n={n} dim={dim} metric={metric} M={M} efC={ef_construction}")
    t0 = time.perf_counter()
    state = BuildState(cfg, n, round_size=round_size)
    state.add(data)
    jax.block_until_ready(state.graph.adj0)
    build_s = time.perf_counter() - t0
    build_vps = n / build_s
    log(f"built in {build_s:.1f}s = {build_vps:.0f} vectors/s")

    log("computing exact ground truth on device")
    gt = device_ground_truth(data, queries, k, metric)

    sweep = []
    chosen = None
    for ef in ef_sweep:
        ids, _ = knn_search(
            state.graph, jnp.asarray(queries), k=k, ef=ef, metric=metric
        )
        r = recall_of(np.asarray(ids), gt)
        qps = measure_qps(state.graph, queries, k, ef, metric, batch=qps_batch)
        sweep.append({"ef": ef, "recall": round(r, 4), "qps": round(qps)})
        log(f"ef={ef}: recall@{k}={r:.4f} qps={qps:.0f}")
        if chosen is None and r >= target_recall:
            chosen = sweep[-1]
            break
    if chosen is None:
        chosen = sweep[-1]

    return {
        "config": name,
        "n": n,
        "dim": dim,
        "metric": metric,
        "build_seconds": round(build_s, 2),
        "build_vectors_per_second": round(build_vps),
        "target_recall": target_recall,
        "recall": chosen["recall"],
        "ef": chosen["ef"],
        "qps": chosen["qps"],
        "sweep": sweep,
        "backend": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
