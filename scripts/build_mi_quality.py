#!/usr/bin/env python3
"""Graph quality vs the build-beam iteration cap (build_mi).

The level-0 construction beam running to convergence is 75% of a warm insert
round (242 of 321 ms at 1M, scripts/profile_build.py); capping it is linear
in time but truncates the W sets feeding neighbor selection.  This measures
the actual quality cost: build 1M at several caps, then sweep the packed
query engine on each graph and report the recall/QPS crossing.

Usage: python scripts/build_mi_quality.py [--n 1000000] [--mi none,40,32,24]
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
    ap.add_argument("--round-size", type=int, default=2048)
    ap.add_argument("--mi", default="none,40,32,24",
                help="comma list of mi[:select_scan] variants, e.g. 40:none,40:64")
    ap.add_argument("--queries", type=int, default=1000)
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

    n, dim, rs = args.n, args.dim, args.round_size
    k = 10
    def parse_one(s):
        s = s.strip()
        mi, _, ss = s.partition(":")
        mi = None if mi in ("none", "") else int(mi)
        ss = None if ss in ("none", "") else int(ss)
        return mi, ss

    mis = [parse_one(s) for s in args.mi.split(",")]

    print(f"[miq] dataset n={n} dim={dim}", flush=True)
    data, make_q = datasets.clustered_device(
        n, dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(args.queries, qseed=8)
    flat = build_flat(data, "l2")
    gt = device_ground_truth(flat, queries, k, "l2")
    del flat

    for mi, ss in mis:
        cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)
        state = BuildState(cfg, n, round_size=rs)
        state.build_mi = mi
        state.select_scan = ss
        t0 = time.perf_counter()
        state.add(data)
        sync(state.graph.n)
        dt = time.perf_counter() - t0
        print(f"[miq] mi={mi} ss={ss}: built in {dt:.1f}s = {n/dt:.0f} vps",
              flush=True)
        seeds = build_seed_index(state.graph, "l2")
        packed = pack_graph(state.graph, "l2")
        sync(packed.scale)
        for ef, qmi, rk in ((96, 14, 48), (96, 15, 48), (96, 16, 48),
                            (96, 18, 48)):
            ids, _ = knn_search_packed(
                state.graph, packed, queries, k=k, ef=ef, metric="l2",
                max_iters=qmi, seeds=seeds, seed_e=8, rerank_k=rk)
            r = recall_of(np.asarray(ids), gt)
            qps = measure_qps(
                lambda q, ef=ef, qmi=qmi, rk=rk: knn_search_packed(
                    state.graph, packed, q, k=k, ef=ef, metric="l2",
                    max_iters=qmi, seeds=seeds, seed_e=8, rerank_k=rk)[0],
                queries, batch=8192)
            print(f"[miq] mi={mi} ss={ss} query ef={ef} qmi={qmi}: "
                  f"recall={r:.4f} qps={qps:.0f}", flush=True)
            if r >= 0.95:
                break
        del state, packed, seeds


if __name__ == "__main__":
    main()
