#!/usr/bin/env python3
"""Locate the fat-row gather cliff: per-node payload of P bytes fetched as
1 chunk row of P vs 2 chunk rows of P/2, at the packed-engine iteration
shape (B queries x E expansions).  The gather is descriptor-rate-bound
(BASELINE.md), so if 1xP rows survive past P=2048 without falling off the
cliff, single-chunk payloads halve the per-iteration descriptor count.

Usage: python scripts/gather_width_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

N = 1_000_000
B, E = 8192, 4


@partial(jax.jit, static_argnames=("c", "w"))
def fetch(pay, idx, c: int, w: int):
    # idx: [B, E] node ids; fetch c chunk rows of w bytes per node
    cid = (idx[:, :, None] * c
           + jnp.arange(c, dtype=jnp.int32)[None, None, :]).reshape(B, -1)
    rows = pay[cid]  # [B, E*c, w]
    # touch every byte so XLA can't elide columns
    return jnp.sum(rows.astype(jnp.float32), axis=(1, 2))


def timeit(fn, reps=30):
    out = fn()
    np.asarray(out).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(out).ravel()[:1]
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.RandomState(0)
    idx = jnp.asarray(rng.randint(0, N, size=(B, E)).astype(np.int32))
    for p in (2048, 2560, 3072, 3584, 4096, 5120):
        for c in (1, 2):
            w = p // c
            if w % 128:
                continue
            pay = jnp.zeros((N * c, w), jnp.int8)
            dt = timeit(lambda pay=pay, c=c, w=w: fetch(pay, idx, c, w))
            rows = B * E * c
            print(f"[gw] P={p:5d}B as {c}x{w:5d}B: {dt*1e3:7.3f} ms  "
                  f"{rows/dt/1e6:6.1f} M rows/s  "
                  f"{B*E*p/dt/2**30:6.1f} GiB/s", flush=True)
            del pay


if __name__ == "__main__":
    main()
