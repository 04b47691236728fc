#!/usr/bin/env python3
"""Race the fused Pallas payload-gather+score kernel against the XLA
gather→score chain at the headline shapes (1M×deg32 payload, B=8192, E=4).

Both sides are ONE jit call per rep (the axon tunnel adds a ~5 ms dispatch
floor per call; reps queue async and sync once).

Usage: python scripts/race_payload_score.py [--n 1000000] [--tb 256]
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


def timeit(name, fn, reps=20):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"[race] {name:<46s} {dt*1e3:8.3f} ms", flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--b", type=int, default=8192)
    ap.add_argument("--e", type=int, default=4)
    ap.add_argument("--deg", type=int, default=32)
    ap.add_argument("--d-pad", type=int, default=128)
    ap.add_argument("--tb", type=int, default=256)
    args = ap.parse_args()

    from ocaml_hnsw_tpu.ops.pallas.payload_score import payload_score

    n, b, e, deg, d_pad = args.n, args.b, args.e, args.deg, args.d_pad
    w = 2048 if (deg * d_pad) % 2048 == 0 else deg * d_pad
    c = (deg * d_pad) // w
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    # tile a small random block to payload size (randint at [n·c, w] would
    # materialize an int32 intermediate ~4x HBM); addresses, not values,
    # determine gather time
    block = jax.random.randint(k1, (4096, w), -127, 128, jnp.int8)
    reps = -(-(n * c) // 4096)
    pay = jnp.tile(block, (reps, 1))[: n * c]
    nodes = jax.random.randint(k2, (b, e), 0, n, jnp.int32)
    q16 = jax.random.normal(k3, (b, d_pad), jnp.bfloat16)

    @jax.jit
    def xla_chain(pay, nodes, q16):
        safe = jnp.maximum(nodes, 0)
        cid = (safe[:, :, None] * c
               + jnp.arange(c, dtype=jnp.int32)[None, None, :]).reshape(b, -1)
        vec8 = pay[cid].reshape(b, e, deg, d_pad)
        return jnp.sum(
            vec8.astype(jnp.bfloat16) * q16[:, None, None, :],
            axis=-1, dtype=jnp.float32,
        ).reshape(b, e * deg)

    fused = jax.jit(lambda pay, nodes, q16: payload_score(
        pay, nodes, q16, deg=deg, d_pad=d_pad, tb=args.tb))

    ref, t_x = timeit("XLA gather + bf16 score", lambda: xla_chain(
        pay, nodes, q16))
    out, t_p = timeit(f"Pallas fused (tb={args.tb})", lambda: fused(
        pay, nodes, q16))

    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"[race] max |diff| = {err:.3e}  speedup = {t_x/t_p:.2f}x",
          flush=True)

    for mode in ("dma", "compute"):
        fm = jax.jit(lambda pay, nodes, q16, mode=mode: payload_score(
            pay, nodes, q16, deg=deg, d_pad=d_pad, tb=args.tb, mode=mode))
        timeit(f"Pallas {mode}-only (tb={args.tb})",
               lambda: fm(pay, nodes, q16))
    for tb in (512, 2048):
        if b % tb == 0:
            f2 = jax.jit(lambda pay, nodes, q16, tb=tb: payload_score(
                pay, nodes, q16, deg=deg, d_pad=d_pad, tb=tb))
            timeit(f"Pallas fused (tb={tb})", lambda: f2(pay, nodes, q16))


if __name__ == "__main__":
    main()
# mode ablation appended by round-3 session (invoked via --modes)
