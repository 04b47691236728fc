"""Pallas TPU kernel: fused random-row gather + L2 distance.

The HNSW beam loop's entire per-iteration cost on v5e is the vector-row
gather — measured 90 M rows/s through XLA's gather (transaction-bound:
f32/bf16/int8 rows all gather at the same rows/s), with the distance
arithmetic fully hidden under it.  This kernel races XLA by issuing the row
fetches as explicit per-row async DMAs (HBM -> VMEM), double-buffered per
query block, computing (x - q)^2 on the VPU while the next query's rows are
in flight.

Outcome of the experiment (v5e, 1M x 128-d, B=8192, K=128): this kernel
reaches 52 M rows/s vs the XLA gather's 90 M rows/s — the scattered fetch
is DMA-descriptor-rate-bound (f32/bf16/int8 rows all gather at equal
rows/s, so bandwidth is not the limit) and the scalar core cannot out-issue
XLA's gather lowering.  Kept as the measurement harness backing
BASELINE.md's claim, so the engine optimizes for FEWER gathered rows
(seed-scan entries, candidate compaction) rather than a custom fetch path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(ids_ref, q_ref, hbm_ref, out_ref, scratch, sems, *, tb: int,
            k: int):
    """ids_ref: SMEM i32[TB, K]; q_ref: VMEM f32[TB, D]; hbm_ref: HBM
    f32[N, D]; out_ref: VMEM f32[TB, K]; scratch: VMEM f32[2, K, D];
    sems: DMA sem[2, K].  Fully unrolled over the TB queries (static)."""

    def issue(buf, qi):
        for kj in range(k):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(ids_ref[qi, kj], 1), :],
                scratch.at[buf, pl.ds(kj, 1), :],
                sems.at[buf, kj],
            ).start()

    def drain(buf, qi):
        for kj in range(k):
            pltpu.make_async_copy(
                hbm_ref.at[pl.ds(ids_ref[qi, kj], 1), :],
                scratch.at[buf, pl.ds(kj, 1), :],
                sems.at[buf, kj],
            ).wait()

    issue(0, 0)
    for qi in range(tb):
        buf = qi % 2
        if qi + 1 < tb:
            issue(1 - buf, qi + 1)
        drain(buf, qi)
        rows = scratch[buf]  # [K, D]
        qrow = q_ref[pl.ds(qi, 1), :]  # [1, D]
        diff = rows - qrow
        out_ref[pl.ds(qi, 1), :] = jnp.sum(diff * diff, axis=1)[None, :]


@partial(jax.jit, static_argnames=("tb", "interpret"))
def gather_l2(
    vectors,  # f32[N, D] (stays in HBM)
    ids,  # i32[B, K]
    q,  # f32[B, D]
    tb: int = 8,
    interpret: bool = False,
):
    """f32[B, K] squared-L2 distances d(q_b, vectors[ids[b, k]]).
    Negative ids are clamped to row 0 by the caller's convention."""
    b, k = ids.shape
    d = vectors.shape[1]
    assert b % tb == 0
    grid = (b // tb,)
    return pl.pallas_call(
        partial(_kernel, tb=tb, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # vectors stay in HBM
        ],
        out_specs=pl.BlockSpec((tb, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, k, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, k)),
        ],
        interpret=interpret,
    )(ids, q, vectors)
