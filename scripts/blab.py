#!/usr/bin/env python3
"""Build-campaign lab: full 1M builds at different (round_size, build_expand,
build_mi) knobs, reporting cold build time, steady-state round time, and the
end-state recall at the headline query operating point (so build-speed knobs
that silently degrade graph quality are caught immediately).

Usage: python scripts/blab.py [--n 1000000] [--configs "2048,4,48;4096,4,48"]
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
    # round_size, build_expand, build_mi
    ap.add_argument("--configs", default="2048,4,48;4096,4,48;2048,8,24")
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.build import BuildState, sample_levels
    from ocaml_hnsw_tpu.models.search import build_seed_index
    from ocaml_hnsw_tpu.models.packed import pack_graph, knn_search_packed
    from ocaml_hnsw_tpu.models.build import insert_round
    from ocaml_hnsw_tpu.bench import datasets
    from ocaml_hnsw_tpu.bench.harness import (
        build_flat, device_ground_truth, measure_qps,
    )
    from ocaml_hnsw_tpu.oracle.bruteforce import recall as recall_of

    n, dim = args.n, args.dim
    k = 10
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)

    print(f"[blab] dataset n={n} dim={dim}", flush=True)
    data, make_q = datasets.clustered_device(
        n, dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(1000, qseed=8)
    flat = build_flat(data, "l2")
    gt = device_ground_truth(flat, queries, k, "l2")
    del flat

    for spec in args.configs.split(";"):
        rs, be, bm = (int(x) for x in spec.split(","))
        t0 = time.perf_counter()
        state = BuildState(cfg, n + rs, round_size=rs)
        state.build_expand = be
        state.build_mi = bm
        sync(state.graph.adj0)
        t_alloc = time.perf_counter() - t0
        # overhead decomposition: first scan-chunk dispatch carries compile /
        # executable-upload cost; the remainder is steady dispatch
        t1 = time.perf_counter()
        state.add(data[: 64 * rs])
        sync(state.graph.n)
        t_first = time.perf_counter() - t1
        t2 = time.perf_counter()
        state.add(data[64 * rs:])
        sync(state.graph.n)
        t_rest = time.perf_counter() - t2
        t_build = time.perf_counter() - t0
        print(f"[blab]   alloc {t_alloc:.1f}s, first 64-round chunk "
              f"{t_first:.1f}s, remaining {(n - 64 * rs)} rows {t_rest:.1f}s "
              f"({(n - 64 * rs) / t_rest:.0f} vps steady-dispatch)",
              flush=True)
        # steady-state single round at the full-graph snapshot
        q = jnp.asarray(
            np.random.RandomState(3).randn(rs, dim).astype(np.float32))
        lv = jnp.asarray(sample_levels(
            np.random.RandomState(99), rs, cfg.mL, state.l_max))
        kw = state._round_kwargs()

        def one_round():
            out = insert_round(
                state.graph, q, lv, state.graph.n, jnp.int32(rs),
                state.seed_bank, state.seed_n, state.seed_vecs,
                state.seed_norms, state.pack_pay, state.pack_meta,
                state.pack_scale, state.pack_dist, **kw)
            return out[0].n

        sync(one_round())
        t0 = time.perf_counter()
        for _ in range(5):
            r = one_round()
        sync(r)
        t_round = (time.perf_counter() - t0) / 5

        seeds = build_seed_index(state.graph, "l2")
        packed = state.packed_graph() or pack_graph(state.graph, "l2")

        def run(qq):
            return knn_search_packed(
                state.graph, packed, qq, k=k, ef=96, metric="l2",
                max_iters=15, seeds=seeds, seed_e=8, rerank_k=32)[0]

        ids = run(jnp.asarray(queries))
        rec = recall_of(np.asarray(ids), gt)
        qps = measure_qps(run, queries, batch=8192)
        print(f"[blab] rs={rs} be={be} bm={bm}: build {t_build:.1f}s "
              f"({n/t_build:.0f} vps), round {t_round*1e3:.1f} ms "
              f"({rs/t_round:.0f} vps steady), recall@10={rec:.4f} "
              f"qps={qps:.0f}", flush=True)
        del state, packed, seeds


if __name__ == "__main__":
    main()
