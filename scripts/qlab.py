#!/usr/bin/env python3
"""Query-engine experiment lab: build 1M once (or --load a saved index),
then sweep packed-engine knobs (deg_limit, rerank_k, ef, max_iters, expand)
across one or more distilled serving adjacencies (models/refine.py) for
recall/QPS crossings.

Usage:
  python scripts/qlab.py --save /tmp/qlab1m.npz           # build once
  python scripts/qlab.py --load /tmp/qlab1m.npz \
      --refine-sweep "none;20:0;20:1;24:1" \
      --sweep "none,96,15,4,32;none,96,18,4,64"
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
    ap.add_argument("--queries", type=int, default=2000)
    ap.add_argument("--save", default=None, help="save the built index here")
    ap.add_argument("--load", default=None, help="load a saved index (skips build)")
    ap.add_argument("--sweep", default=(
        # (deg_limit, ef, mi, expand, rerank_k)
        "none,96,15,4,32;"        # packed-payload baseline
        "none,96,18,4,64;"
        "none,96,21,4,64"
    ))
    ap.add_argument("--refine-sweep", default="none",
                    help="semicolon list of serving adjacencies: 'none' or "
                    "OUT_DEG[:HOPS]; each runs the full --sweep")
    ap.add_argument("--max-chunk", type=int, default=2048,
                    help="payload chunk-width cap (4096 = one fat row per "
                    "node at deg=32 x 128-d)")
    ap.add_argument("--bits", type=int, default=8,
                    help="payload precision: 8 (int8) or 4 (nibble-packed)")
    ap.add_argument("--fused", action="store_true",
                    help="fused meta-in-payload layout (one gather/node)")
    ap.add_argument("--seed-cap", type=int, default=None,
                    help="cap the seed bank rows (entry-scan cost knob)")
    ap.add_argument("--metric", default="l2",
                    help="dataset/build/query metric (l2, cosine, ip)")
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
    metric = args.metric
    cfg = HnswConfig(dim=dim, metric=metric, M=16, ef_construction=200)

    print(f"[qlab] dataset n={n} dim={dim} batch={b}", flush=True)
    data, make_q = datasets.clustered_device(
        n, dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(args.queries, qseed=8)
    gt = device_ground_truth(data, queries, k, metric)

    if args.load:
        from ocaml_hnsw_tpu.io import load_index_file

        t0 = time.perf_counter()
        base_graph, lcfg, _, _, _, _ = load_index_file(args.load)
        sync(base_graph.n)
        del data
        print(f"[qlab] loaded {args.load} in {time.perf_counter()-t0:.1f}s",
              flush=True)
    else:
        t0 = time.perf_counter()
        state = BuildState(cfg, n, round_size=2048)
        state.add(data)
        sync(state.graph.n)
        del data
        print(f"[qlab] built in {time.perf_counter()-t0:.1f}s", flush=True)
        base_graph = state.graph
        if args.save:
            from ocaml_hnsw_tpu.io import save_index_file

            save_index_file(args.save, base_graph, cfg,
                            np.arange(n, dtype=np.int64))
            print(f"[qlab] saved to {args.save}", flush=True)
    seeds = build_seed_index(base_graph, metric, cap=args.seed_cap)

    for rspec in args.refine_sweep.split(";"):
        rspec = rspec.strip()
        if rspec == "none":
            graph = base_graph
            tag = "full"
        else:
            from ocaml_hnsw_tpu.models.refine import refined_graph

            parts = rspec.split(":")
            out_deg = int(parts[0])
            hops = int(parts[1]) if len(parts) > 1 else 0
            t0 = time.perf_counter()
            graph = refined_graph(base_graph, out_deg, metric, hops=hops)
            sync(graph.adj0)
            tag = f"deg{out_deg}h{hops}"
            print(f"[qlab] refined to {tag} in "
                  f"{time.perf_counter()-t0:.1f}s", flush=True)
        packed = pack_graph(graph, metric, max_chunk=args.max_chunk,
                            bits=args.bits, fused=args.fused)
        sync(packed.scale)
        print(f"[qlab] {tag}: payload {packed.pay.nbytes/2**30:.2f} GiB "
              f"deg={packed.deg} chunks={packed.chunks}x"
              f"{packed.pay.shape[1]}B", flush=True)

        for spec in args.sweep.split(";"):
            parts = spec.split(",")
            dl_s, ef_s, mi_s, e_s, rk_s = parts[:5]
            dl = None if dl_s.strip() == "none" else int(dl_s)
            ef, mi, rk = int(ef_s), int(mi_s), int(rk_s)
            if "x" in e_s:
                # expand schedule, e.g. "8x2+2x26" = 2 iters at e=8 then
                # 26 at e=2 (mi field is ignored)
                sched = tuple(
                    tuple(int(v) for v in part.split("x"))
                    for part in e_s.split("+")
                )
                e, mi_arg = 4, None
            else:
                sched, e, mi_arg = None, int(e_s), mi
            ee = bool(int(parts[5])) if len(parts) > 5 else True
            se = int(parts[6]) if len(parts) > 6 else 8
            il = int(parts[7]) if len(parts) > 7 else 1

            def run(q):
                return knn_search_packed(
                    graph, packed, q, k=k, ef=ef, metric=metric,
                    max_iters=mi_arg, expand=e, seeds=seeds, seed_e=se,
                    rerank_k=rk, deg_limit=dl, early_exit=ee,
                    bits=args.bits, expand_schedule=sched,
                    fused=args.fused, interleave=il)[0]
            ids = run(queries)
            r = recall_of(np.asarray(ids), gt)
            qps = measure_qps(run, queries, batch=b)
            print(f"[qlab] {tag} dl={dl} ef={ef} mi={mi} e={e_s} rk={rk} "
                  f"ee={int(ee)} se={se} il={il}: "
                  f"recall={r:.4f} qps={qps:.0f}", flush=True)
        del packed
        if graph is not base_graph:
            del graph


if __name__ == "__main__":
    main()
