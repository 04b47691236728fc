#!/usr/bin/env python3
"""Fixed-cost decomposition of knn_search_packed (VERDICT r4 task 1).

The per-batch cost at the headline operating point (B=4096, e=2, mi=29) is
~46 ms, of which BASELINE.md's slope method attributes ~20 ms to FIXED
per-batch work outside the beam loop: seed scan + exact rerank + query
prep + dispatch.  This lab splits that 20 ms directly:

  T(mi)        full engine at mi in {0, 8, 16, 29}  -> slope + intercept
  T(0) stages  the mi=0 engine with one fixed stage ablated at a time:
    noseed     fixed entry ids (node 0..e-1 broadcast) instead of the
               [B, U_cap] MXU seed scan + approx_min_k + exact rescore
    norerank   return beam top-k directly (no exact-f32 rerank gather)
    noprep     queries pre-quantized outside the timed region

Usage: python scripts/fixlab.py --load /tmp/qlab1m.npz [--batch 4096]
"""

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

from ocaml_hnsw_tpu.models.packed import (  # noqa: E402
    beam_search_layer_packed, quantize_queries,
)
from ocaml_hnsw_tpu.models.search import (  # noqa: E402
    seed_entries, preprocess_queries,
)
from ocaml_hnsw_tpu.ops.distance import dists_to_ids, query_norms  # noqa: E402
from ocaml_hnsw_tpu.ops.sortmerge import topk_ascending  # noqa: E402
from ocaml_hnsw_tpu.ops.distance import INF  # noqa: E402


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


@partial(jax.jit, static_argnames=(
    "k", "ef", "max_iters", "expand", "seed_e", "rerank_k", "stage"))
def engine(graph, packed, seeds, queries, k: int, ef: int, max_iters: int,
           expand: int, seed_e: int, rerank_k: int, stage: str):
    metric = "l2"
    q = preprocess_queries(queries, metric)
    qn = query_norms(q, metric)
    if stage == "noseed":
        entry_ids = jnp.broadcast_to(
            jnp.arange(seed_e, dtype=jnp.int32)[None, :],
            (q.shape[0], seed_e))
        entry_d = dists_to_ids(graph.vectors, graph.scales, graph.norms,
                               q, qn, entry_ids, metric)
    else:
        entry_ids, entry_d = seed_entries(graph, seeds, q, qn, seed_e, metric)
    q8 = quantize_queries(q, packed.scale)
    ids, d, _ = beam_search_layer_packed(
        packed, q8, qn, entry_ids, entry_d, ef,
        needs_norms=True, max_iters=max_iters, expand=expand,
        early_exit=False,
    )
    dead = graph.deleted[jnp.maximum(ids, 0)] | (ids < 0)
    d = jnp.where(dead, INF, d)
    if stage == "norerank":
        out_d, out_ids = topk_ascending(d, jnp.where(dead, -1, ids), k)
        return out_ids, out_d
    _, top_ids = topk_ascending(d, jnp.where(dead, -1, ids), rerank_k)
    d_exact = dists_to_ids(
        graph.vectors, graph.scales, graph.norms, q, qn, top_ids, metric)
    out_d, out_ids = topk_ascending(d_exact, top_ids, k)
    return out_ids, out_d


def timed(fn, q, reps=8):
    for _ in range(2):
        sync(fn(q))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(q)
    sync(out)
    return (time.perf_counter() - t0) / reps * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", default="/tmp/qlab1m.npz")
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--ef", type=int, default=64)
    ap.add_argument("--expand", type=int, default=2)
    args = ap.parse_args()

    from ocaml_hnsw_tpu.io import load_index_file
    from ocaml_hnsw_tpu.models.search import build_seed_index
    from ocaml_hnsw_tpu.models.packed import pack_graph

    graph, cfg, _, _, _, _ = load_index_file(args.load)
    sync(graph.n)
    print(f"[fixlab] loaded n={int(graph.n)}", flush=True)
    seeds = build_seed_index(graph, "l2")
    print(f"[fixlab] seed bank rows={seeds.ids.shape[0]}", flush=True)
    packed = pack_graph(graph, "l2")
    sync(packed.scale)

    rng = np.random.RandomState(3)
    q = jnp.asarray(
        np.asarray(graph.vectors[: args.batch]).astype(np.float32)
        + rng.randn(args.batch, graph.dim).astype(np.float32) * 0.01)

    b = args.batch
    for stage in ("full", "noseed", "norerank", "noprep_placeholder"):
        if stage == "noprep_placeholder":
            continue
        for mi in (0, 8, 29):
            fn = lambda qq, mi=mi, stage=stage: engine(
                graph, packed, seeds, qq, k=10, ef=args.ef, max_iters=mi,
                expand=args.expand, seed_e=8, rerank_k=32, stage=stage)
            ms = timed(fn, q)
            print(f"[fixlab] stage={stage:9s} mi={mi:3d}: {ms:7.2f} ms/batch "
                  f"({b / ms * 1000:7.0f} qps)", flush=True)

    # dispatch floor: a trivial jitted fn on the same args
    @jax.jit
    def nop(queries):
        return queries[:1, :1] + 1.0

    ms = timed(lambda qq: nop(qq), q)
    print(f"[fixlab] dispatch floor (nop jit): {ms:.2f} ms", flush=True)

    # isolated seed scan
    @partial(jax.jit, static_argnames=("e",))
    def seedscan(graph, seeds, queries, e: int):
        q = preprocess_queries(queries, "l2")
        qn = query_norms(q, "l2")
        return seed_entries(graph, seeds, q, qn, e, "l2")

    ms = timed(lambda qq: seedscan(graph, seeds, qq, e=8), q)
    print(f"[fixlab] isolated seed scan (incl prep+dispatch): {ms:.2f} ms",
          flush=True)
    extra(args, graph, packed, seeds, q)


def extra(args, graph, packed, seeds, q):
    """Extra probes appended during the round-5 session (kept for re-runs):
    arg-tree dispatch cost, per-B loop slope (latency share)."""
    # nop with the REAL argument tree: measures host-side dispatch cost of
    # the engine signature vs the single-arg nop
    @partial(jax.jit, static_argnames=())
    def nop_full(graph, packed, seeds, queries):
        return queries[:1, :1] + packed.scale

    ms = timed(lambda qq: nop_full(graph, packed, seeds, qq), q)
    print(f"[fixlab] dispatch floor (full-arg nop): {ms:.2f} ms", flush=True)

    # loop slope per batch size: latency share = 2*slope(B/2) - slope(B)
    for b_sub in (1024, 2048, 4096, 8192):
        rng = np.random.RandomState(4)
        qq = jnp.asarray(
            np.asarray(graph.vectors[:b_sub]).astype(np.float32)
            + rng.randn(b_sub, graph.dim).astype(np.float32) * 0.01)
        ts = {}
        for mi in (8, 29):
            fn = lambda x, mi=mi: engine(
                graph, packed, seeds, x, k=10, ef=64, max_iters=mi,
                expand=2, seed_e=8, rerank_k=32, stage="full")
            ts[mi] = timed(fn, qq)
        slope = (ts[29] - ts[8]) / 21
        print(f"[fixlab] B={b_sub}: slope {slope:.3f} ms/iter  "
              f"T(29)={ts[29]:.2f} ms ({b_sub/ts[29]*1000:.0f} qps)",
              flush=True)


if __name__ == "__main__":
    main()
