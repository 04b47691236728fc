#!/usr/bin/env python3
"""Real-engine slope comparison across payload layouts.

iterlab.py's ablations mislead where XLA hoists work out of the loop (a
broadcast payload makes the score loop-invariant), so this lab measures the
REAL beam_search_layer_packed at mi=8 vs mi=24 for each payload layout and
reports the slope.  Differences between layouts are then true end-to-end
per-iteration costs of the fetch+score path.

Layouts: int8 2x2048 (baseline), int8 1x4096 (fat row), int4 1x2048,
int8 deg_limit=16 (1x2048 fetch of half the candidates).

Usage: python scripts/iterlab2.py --load /tmp/qlab1m.npz
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


def timeit(fn, reps=8):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", default="/tmp/qlab1m.npz")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--ef", type=int, default=96)
    ap.add_argument("--expand", type=int, default=4)
    args = ap.parse_args()

    from functools import partial
    from ocaml_hnsw_tpu.io import load_index_file
    from ocaml_hnsw_tpu.models.packed import (
        pack_graph, quantize_queries, beam_search_layer_packed,
    )
    from ocaml_hnsw_tpu.models.search import (
        build_seed_index, seed_entries, preprocess_queries,
    )
    from ocaml_hnsw_tpu.ops.distance import query_norms
    from ocaml_hnsw_tpu.bench import datasets

    graph, cfg, _, _, _, _ = load_index_file(args.load)
    sync(graph.n)
    n = int(graph.n)
    print(f"[iter2] loaded n={n}", flush=True)
    seeds = build_seed_index(graph, "l2")
    _, make_q = datasets.clustered_device(
        n, cfg.dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(args.batch, qseed=8)
    q = preprocess_queries(jnp.asarray(queries), "l2")
    qn = query_norms(q, "l2")
    e_ids, e_d = jax.jit(
        lambda g, s, q, qn: seed_entries(g, s, q, qn, 8, "l2")
    )(graph, seeds, q, qn)

    beam_jit = jax.jit(
        beam_search_layer_packed,
        static_argnames=("ef", "needs_norms", "max_iters", "expand",
                         "deg_limit", "early_exit", "bits"),
    )

    ef, e = args.ef, args.expand

    def run_case(name, packed, bits, qv, deg_limit=None):
        ts = {}
        for mi in (8, 24):
            ts[mi] = timeit(lambda m=mi: beam_jit(
                packed, qv, qn, e_ids, e_d, ef=ef, needs_norms=True,
                max_iters=m, expand=e, deg_limit=deg_limit,
                early_exit=False, bits=bits))
        slope = (ts[24] - ts[8]) / 16
        print(f"[iter2] {name:<24s} slope {slope*1e3:6.2f} ms/iter "
              f"(mi8 {ts[8]*1e3:6.1f} / mi24 {ts[24]*1e3:6.1f})", flush=True)

    # int8 baseline 2x2048
    p = pack_graph(graph, "l2")
    q8 = quantize_queries(q, p.scale)
    run_case("int8 2x2048", p, 8, q8)
    run_case("int8 2x2048 dl=16", p, 8, q8, deg_limit=16)
    del p
    # int8 fat row 1x4096
    p = pack_graph(graph, "l2", max_chunk=4096)
    run_case("int8 1x4096", p, 8, q8)
    del p
    # int4 1x2048
    p = pack_graph(graph, "l2", bits=4)
    q16 = (q / p.scale).astype(jnp.bfloat16)
    run_case("int4 1x2048", p, 4, q16)
    run_case("int4 1x2048 dl=16", p, 4, q16, deg_limit=16)
    del p


if __name__ == "__main__":
    main()
