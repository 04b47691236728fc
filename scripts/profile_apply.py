#!/usr/bin/env python3
"""apply_edges variant sweep at the 1M snapshot: REV_GROUP x stored/gather
distances.  The stage profile showed the dcomb vector re-gather hides under
the latency-bound rev scatter loop, so the two levers must be measured
JOINTLY — stored dists only pay once the serial loop shrinks."""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--round-size", type=int, default=2048)
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models import build as B
    from ocaml_hnsw_tpu.models.packed import (
        PackedGraph, beam_search_layer_packed, quantize_queries,
    )
    from ocaml_hnsw_tpu.ops.distance import dists_to_ids, query_norms
    from ocaml_hnsw_tpu.ops.sortmerge import bitonic_sort, next_pow2
    from ocaml_hnsw_tpu.bench import datasets

    n, dim, rs = args.n, args.dim, args.round_size
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)
    efc, m, m_max0, rev_cap = cfg.ef_construction, cfg.M, cfg.M_max0, 8

    print(f"[papply] n={n} dim={dim} rs={rs}", flush=True)
    data, _ = datasets.clustered_device(n, dim, n_clusters=max(64, n // 2500),
                                        seed=7)
    t0 = time.perf_counter()
    state = B.BuildState(cfg, n + rs, round_size=rs)
    state.add(data)
    state.graph.n.block_until_ready()
    print(f"[papply] build {time.perf_counter()-t0:.1f}s", flush=True)

    graph = state.graph
    metric = cfg.metric
    vectors, scales, norms = graph.vectors, graph.scales, graph.norms
    q = jnp.asarray(np.random.RandomState(3).randn(rs, dim).astype(np.float32))
    qn = query_norms(q, metric)
    pk = PackedGraph(pay=state.pack_pay, meta=state.pack_meta,
                     scale=state.pack_scale, dist=state.pack_dist)
    q8 = quantize_queries(q, state.pack_scale)
    if pk.d_pad > q8.shape[1]:
        q8 = jnp.pad(q8, ((0, 0), (0, pk.d_pad - q8.shape[1])))

    # representative sel_ids/sel_d via one real beam + selection
    s_pad = jnp.full((rs, 16), -1, jnp.int32)
    entry_ids = jnp.concatenate(
        [jnp.broadcast_to(graph.entry, (rs,))[:, None],
         jnp.full((rs, 31), -1, jnp.int32)], axis=1)
    entry_d = jnp.concatenate(
        [dists_to_ids(vectors, scales, norms, q, qn,
                      jnp.broadcast_to(graph.entry, (rs,))[:, None],
                      metric),
         jnp.full((rs, 31), jnp.inf)], axis=1)
    beam_j = jax.jit(partial(beam_search_layer_packed, needs_norms=True,
                             max_iters=48, expand=4),
                     static_argnames=("ef",))
    w_ids, _, _ = beam_j(pk, q8, qn, entry_ids, entry_d, ef=efc)

    @jax.jit
    def prep(w_ids, vectors, scales, norms, q, qn):
        w_d = dists_to_ids(vectors, scales, norms, q, qn, w_ids, metric)
        p2 = next_pow2(efc)
        wd = jnp.pad(w_d, ((0, 0), (0, p2 - efc)), constant_values=jnp.inf)
        wi = jnp.pad(w_ids, ((0, 0), (0, p2 - efc)), constant_values=-1)
        wd, (wi,) = bitonic_sort(wd, [wi], ascending=True)
        return B.select_neighbors(vectors, scales, norms, wi[:, :efc],
                                  wd[:, :efc], m, metric,
                                  cfg.keep_pruned_connections)

    sel_ids, sel_d = prep(w_ids, vectors, scales, norms, q, qn)
    sel_ids.block_until_ready()

    p_ids = (graph.n + jnp.arange(rs, dtype=jnp.int32)).astype(jnp.int32)
    valid = jnp.ones((rs,), bool)

    for g in (1, 2, 4, 8, 16):
        for stored in (False, True):
            B.REV_BLOCK_ROWS = g * rs
            fn = jax.jit(partial(
                B.apply_edges, m_cap=m_max0, rev_cap=rev_cap, metric=metric,
                keep_pruned=cfg.keep_pruned_connections, heuristic=True,
            ))
            pd = state.pack_dist if stored else None

            def call():
                return fn(graph.adj0, vectors, scales, norms, p_ids,
                          sel_ids, sel_d, valid, pack_dist=pd)

            out = call()
            out.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(8):
                out = call()
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / 8
            print(f"[papply] g={g:<2d} stored={int(stored)}: "
                  f"{dt*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
