#!/usr/bin/env python3
"""Per-stage profile of the PACKED 1M insert round (round-3 build campaign).

The round-2 profiler (profile_build.py) predates packed construction; this
one times the real thing: packed insert_round at the 1M snapshot, sweeping
the build-beam iteration cap, plus differential stage costs (upper-level
loop via all-level-0 rounds, payload refresh, apply_edges).

Usage: python scripts/profile_build2.py [--n 1000000]
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
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.build import (
        BuildState, insert_round, sample_levels,
    )
    from ocaml_hnsw_tpu.bench import datasets

    n, dim, rs = args.n, args.dim, args.round_size
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)

    print(f"[pb2] dataset n={n} dim={dim} rs={rs}", flush=True)
    data, _ = datasets.clustered_device(n, dim, n_clusters=max(64, n // 2500),
                                        seed=7)

    t0 = time.perf_counter()
    state = BuildState(cfg, n + rs, round_size=rs)
    state.add(data)
    sync(state.graph.n)
    t_build = time.perf_counter() - t0
    print(f"[pb2] build total {t_build:.1f}s = {n/t_build:.0f} vps "
          f"(packed={state.pack_pay is not None})", flush=True)

    graph = state.graph
    kw = state._round_kwargs()

    rng = np.random.RandomState(99)
    q = jnp.asarray(np.random.RandomState(3).randn(rs, dim).astype(np.float32))
    lv_real = jnp.asarray(sample_levels(rng, rs, cfg.mL, state.l_max))
    lv_zero = jnp.zeros((rs,), jnp.int32)

    def round_fn(lv, **over):
        k2 = dict(kw, **over)

        def f():
            out = insert_round(
                graph, q, lv, graph.n, jnp.int32(rs),
                state.seed_bank, state.seed_n, state.seed_vecs,
                state.seed_norms, state.pack_pay, state.pack_meta,
                state.pack_scale, state.pack_dist, **k2,
            )
            return out[0].n
        return f

    def timeit(name, fn, reps=5):
        t_c0 = time.perf_counter()
        out = fn()
        sync(out)
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"[pb2] {name:<38s} {dt*1e3:8.2f} ms  "
              f"(first-call {compile_s:.1f}s)  -> {rs/dt:.0f} vps", flush=True)
        return dt

    t_def = timeit("packed round (default mi=None->100)", round_fn(lv_real))
    t_lv0 = timeit("packed round, all level 0", round_fn(lv_zero))
    print(f"[pb2]   upper-level stages cost: {(t_def-t_lv0)*1e3:.2f} ms",
          flush=True)
    for mi in (48, 40, 32, 24):
        timeit(f"packed round mi={mi}", round_fn(lv_real, build_mi=mi))
    for e in (8, 16):
        timeit(f"packed round expand={e}", round_fn(lv_real, build_expand=e))
    timeit("packed round e=8 mi=32",
           round_fn(lv_real, build_expand=8, build_mi=32))
    # classic beam for reference (pack args dropped)
    def classic():
        out = insert_round(
            graph, q, lv_real, graph.n, jnp.int32(rs),
            state.seed_bank, state.seed_n, state.seed_vecs,
            state.seed_norms, **kw,
        )
        return out[0].n
    timeit("classic round (no pack)", classic)


if __name__ == "__main__":
    main()
