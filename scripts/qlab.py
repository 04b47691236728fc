#!/usr/bin/env python3
"""Query-engine experiment lab: build 1M once, then sweep packed-engine
knobs (deg_limit, rerank_k, ef, max_iters, expand) for recall/QPS crossings.

Usage: python scripts/qlab.py [--n 1000000]
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
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--sweep", default=(
        # (deg_limit, ef, mi, expand, rerank_k)
        "none,96,15,4,32;"        # packed-payload baseline
        "none,96,15,4,16;"        # cheaper rerank
        "16,96,18,4,32;"          # deg_limit ladder
        "16,96,20,4,32;"
        "16,96,22,4,32"
    ))
    ap.add_argument("--refine", default=None,
                    help="OUT_DEG[:HOPS] — distill the serving adjacency "
                    "(models/refine.py) and run the sweep against it")
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.build import BuildState
    from ocaml_hnsw_tpu.models.search import build_seed_index
    from ocaml_hnsw_tpu.models.packed import pack_graph, knn_search_packed
    from ocaml_hnsw_tpu.bench import datasets
    from ocaml_hnsw_tpu.bench.harness import (
        build_flat, device_ground_truth, measure_qps,
    )
    from ocaml_hnsw_tpu.oracle.bruteforce import recall as recall_of

    n, dim, b = args.n, args.dim, args.batch
    k = 10
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)

    print(f"[qlab] dataset n={n} dim={dim} batch={b}", flush=True)
    data, make_q = datasets.clustered_device(
        n, dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(1000, qseed=8)
    flat = build_flat(data, "l2")
    gt = device_ground_truth(flat, queries, k, "l2")
    del flat

    t0 = time.perf_counter()
    state = BuildState(cfg, n, round_size=2048)
    state.add(data)
    sync(state.graph.n)
    print(f"[qlab] built in {time.perf_counter()-t0:.1f}s", flush=True)
    graph = state.graph
    seeds = build_seed_index(graph, "l2")
    if args.refine:
        from ocaml_hnsw_tpu.models.refine import refined_graph

        parts = args.refine.split(":")
        out_deg, hops = int(parts[0]), int(parts[1]) if len(parts) > 1 else 0
        t0 = time.perf_counter()
        graph = refined_graph(graph, out_deg, "l2", hops=hops)
        sync(graph.adj0)
        print(f"[qlab] refined to deg={out_deg} hops={hops} in "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
    packed = pack_graph(graph, "l2")
    sync(packed.scale)

    for spec in args.sweep.split(";"):
        parts = spec.split(",")
        dl_s, ef_s, mi_s, e_s, rk_s = parts[:5]
        dl = None if dl_s.strip() == "none" else int(dl_s)
        ef, mi, e, rk = int(ef_s), int(mi_s), int(e_s), int(rk_s)

        def run(q):
            return knn_search_packed(
                graph, packed, q, k=k, ef=ef, metric="l2", max_iters=mi,
                expand=e, seeds=seeds, seed_e=8, rerank_k=rk,
                deg_limit=dl)[0]
        ids = run(queries)
        r = recall_of(np.asarray(ids), gt)
        qps = measure_qps(run, queries, batch=b)
        print(f"[qlab] dl={dl} ef={ef} mi={mi} e={e} rk={rk}: "
              f"recall={r:.4f} qps={qps:.0f}", flush=True)


if __name__ == "__main__":
    main()
