#!/usr/bin/env python3
"""Microbench of SELECT-NEIGHBORS admit-loop variants at the two hot shapes:
the apply_edges shrink ([32768, 40] admit m=32) and level-0 selection
([2048, 200] / scan_limit prefix, admit m=16).  Synthetic inputs — no index
snapshot needed."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

INF = jnp.float32(np.inf)


def old_scan_admit(cand_d, pair_d, valid, m: int, keep_pruned: bool):
    """round-2 variant: K sequential steps, contiguous pair_d row slices."""
    b, k = cand_d.shape

    def body(j, state):
        sel, cnt = state
        pj = jax.lax.dynamic_slice_in_dim(pair_d, j, 1, axis=1)[:, 0, :]
        dmin = jnp.min(jnp.where(sel, pj, INF), axis=1)
        dj = jax.lax.dynamic_slice_in_dim(cand_d, j, 1, axis=1)[:, 0]
        vj = jax.lax.dynamic_slice_in_dim(valid, j, 1, axis=1)[:, 0]
        admit = vj & (cnt < m) & (dj < dmin)
        sel = jax.lax.dynamic_update_slice_in_dim(
            sel, admit[:, None], j, axis=1)
        return sel, cnt + admit.astype(jnp.int32)

    sel, cnt = jax.lax.fori_loop(
        0, k, body,
        (jnp.zeros((b, k), jnp.bool_), jnp.zeros((b,), jnp.int32)))
    if keep_pruned:
        free = m - cnt
        rej = valid & ~sel
        rank = jnp.cumsum(rej, axis=1)
        sel = sel | (rej & (rank <= free[:, None]))
    return sel


def winner_take_admit(cand_d, pair_d, valid, m: int, keep_pruned: bool):
    """m winner steps; pair column via take_along_axis (current build.py)."""
    b, k = cand_d.shape
    col = jnp.arange(k, dtype=jnp.int32)[None, :]

    def body(t, state):
        sel, dmin, cnt = state
        ok = valid & ~sel & (cand_d < dmin)
        admit = jnp.any(ok, axis=1) & (cnt < m)
        j = jnp.argmax(ok, axis=1)
        sel = sel | ((col == j[:, None]) & admit[:, None])
        pj = jnp.take_along_axis(pair_d, j[:, None, None], axis=2)[:, :, 0]
        dmin = jnp.where(admit[:, None], jnp.minimum(dmin, pj), dmin)
        return sel, dmin, cnt + admit.astype(jnp.int32)

    sel, _, cnt = jax.lax.fori_loop(
        0, m, body,
        (jnp.zeros((b, k), jnp.bool_), jnp.full((b, k), INF),
         jnp.zeros((b,), jnp.int32)))
    if keep_pruned:
        free = m - cnt
        rej = valid & ~sel
        rank = jnp.cumsum(rej, axis=1)
        sel = sel | (rej & (rank <= free[:, None]))
    return sel


def winner_onehot_admit(cand_d, pair_d, valid, m: int, keep_pruned: bool):
    """m winner steps; pair column via one-hot masked min (full pair read)."""
    b, k = cand_d.shape
    col = jnp.arange(k, dtype=jnp.int32)[None, :]

    def body(t, state):
        sel, dmin, cnt = state
        ok = valid & ~sel & (cand_d < dmin)
        admit = jnp.any(ok, axis=1) & (cnt < m)
        j = jnp.argmax(ok, axis=1)
        oh = col == j[:, None]  # [B, K]
        sel = sel | (oh & admit[:, None])
        pj = jnp.min(jnp.where(oh[:, None, :], pair_d, INF), axis=2)
        dmin = jnp.where(admit[:, None], jnp.minimum(dmin, pj), dmin)
        return sel, dmin, cnt + admit.astype(jnp.int32)

    sel, _, cnt = jax.lax.fori_loop(
        0, m, body,
        (jnp.zeros((b, k), jnp.bool_), jnp.full((b, k), INF),
         jnp.zeros((b,), jnp.int32)))
    if keep_pruned:
        free = m - cnt
        rej = valid & ~sel
        rank = jnp.cumsum(rej, axis=1)
        sel = sel | (rej & (rank <= free[:, None]))
    return sel


def bench(name, fn, args, reps=10):
    f = jax.jit(fn, static_argnames=("m", "keep_pruned"))
    out = f(*args[:3], m=args[3], keep_pruned=args[4])
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args[:3], m=args[3], keep_pruned=args[4])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"[admit] {name:<44s} {dt*1e3:8.2f} ms", flush=True)
    return out


def main():
    rng = np.random.RandomState(0)
    for (b, k, m, label) in ((32768, 40, 32, "shrink"),
                             (2048, 200, 16, "select-full"),
                             (2048, 64, 16, "select-sl64")):
        print(f"[admit] ---- shape [{b},{k}] m={m} ({label})", flush=True)
        x = rng.randn(b, k, 8).astype(np.float32)
        q = rng.randn(b, 8).astype(np.float32)
        cand_d = jnp.asarray(np.sort(((x - q[:, None]) ** 2).sum(-1), axis=1))
        pair_d = jnp.asarray(
            ((x[:, :, None] - x[:, None, :]) ** 2).sum(-1))
        valid = jnp.asarray(rng.rand(b, k) > 0.1)
        args = (cand_d, pair_d, valid, m, True)
        o1 = bench("old K-step scan", old_scan_admit, args)
        o2 = bench("winner + take_along column", winner_take_admit, args)
        o3 = bench("winner + one-hot masked-min column",
                   winner_onehot_admit, args)
        a1, a2, a3 = (np.asarray(o) for o in (o1, o2, o3))
        print(f"[admit] agreement: take={np.array_equal(a1, a2)} "
              f"onehot={np.array_equal(a1, a3)}", flush=True)


if __name__ == "__main__":
    main()
