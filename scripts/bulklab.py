#!/usr/bin/env python3
"""Bulk-builder lab: time a full bulk_build at scale on hardware and verify
end-state recall at the headline query operating point, vs the incremental
builder's numbers (scripts/blab.py).

Usage: python scripts/bulklab.py [--n 1000000] [--knn-k 64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--knn-k", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--refine", default=None,
                    help="OUT_DEG[:HOPS] serving-graph distillation sweep too")
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.bulk import bulk_build
    from ocaml_hnsw_tpu.models.search import build_seed_index
    from ocaml_hnsw_tpu.models.packed import pack_graph, knn_search_packed
    from ocaml_hnsw_tpu.bench import datasets
    from ocaml_hnsw_tpu.bench.harness import (
        device_ground_truth, measure_qps,
    )
    from ocaml_hnsw_tpu.oracle.bruteforce import recall as recall_of

    n, dim = args.n, args.dim
    k = 10
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)

    print(f"[bulklab] dataset n={n} dim={dim}", flush=True)
    data, make_q = datasets.clustered_device(
        n, dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(1000, qseed=8)
    gt = device_ground_truth(data, queries, k, "l2")

    t0 = time.perf_counter()
    graph = bulk_build(data, cfg, knn_k=args.knn_k, batch=args.batch,
                       verbose=True)
    sync(graph.n)
    t_build = time.perf_counter() - t0
    print(f"[bulklab] bulk build {t_build:.1f}s = {n/t_build:.0f} vps "
          f"(incl. compile)", flush=True)

    seeds = build_seed_index(graph, "l2")
    graphs = [("full", graph)]
    if args.refine:
        from ocaml_hnsw_tpu.models.refine import refined_graph

        parts = args.refine.split(":")
        od, hops = int(parts[0]), int(parts[1]) if len(parts) > 1 else 0
        t0 = time.perf_counter()
        rg = refined_graph(graph, od, "l2", hops=hops)
        sync(rg.adj0)
        print(f"[bulklab] refined deg={od} hops={hops} in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        graphs.append((f"refined{od}", rg))

    for name, g in graphs:
        packed = pack_graph(g, "l2")
        sync(packed.scale)
        for ef, mi in ((96, 14), (96, 15), (96, 16), (96, 18), (96, 20),
                       (96, 22)):
            def run(q, ef=ef, mi=mi, g=g, packed=packed):
                return knn_search_packed(
                    g, packed, q, k=k, ef=ef, metric="l2", max_iters=mi,
                    seeds=seeds, seed_e=8, rerank_k=32)[0]
            ids = run(jnp.asarray(queries))
            r = recall_of(np.asarray(ids), gt)
            qps = measure_qps(run, queries, batch=8192)
            print(f"[bulklab] {name} ef={ef} mi={mi}: recall@10={r:.4f} "
                  f"qps={qps:.0f}", flush=True)
            if r >= 0.96:
                break
        del packed


if __name__ == "__main__":
    main()
