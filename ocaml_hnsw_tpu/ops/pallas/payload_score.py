"""Fused payload-gather + int8 score Pallas kernel (round-3 query campaign).

The packed beam loop's per-iteration cost splits into (measured, v5e, 1M,
B=8192, E=4, deg=32): payload gather + bf16 score ~4.9 ms in-loop, plus VPU
merge/dedup ~2.7 ms.  The gather and score are SERIAL XLA ops: the gather
materializes the [B, E·C, W] block to HBM and the score reads it back — 2×
the payload bytes over the HBM bus, with the DMA stream idle during the
score pass.  The deg_limit ladder (scripts/qlab.py) shows the loop is
strongly gather-bound: halving payload bytes took 67k → 100k QPS (at ruined
recall) — so halving payload HBM traffic at EQUAL trajectory is the prize.

Design: each node's inlined neighborhood is one CONTIGUOUS [deg, d_pad]
int8 slab — exactly one (32, 128) int8 VMEM tile at the headline shape.
One grid program handles G queries: fully-unrolled static DMA issue of
their G·E slabs, then ONE MXU contraction q_block[G, d] · all_slabsᵀ →
[G, G·E·deg] with the per-query diagonal blocks extracted by static slices.

MEASURED VERDICT (v5e, 1M payload, B=8192, E=4, deg=32, bit-exact output
vs the XLA chain; scripts/race_payload_score.py):

    XLA gather→score chain            11.8-13.1 ms
    this kernel, full                 25.0-27.9 ms   (0.45-0.47×: LOSES)
    this kernel, DMA only             24.6-31.3 ms
    this kernel, compute only         25.0-28.1 ms

  - The scattered slab fetch costs ~770 ns per 4 KB DMA (~5.4 GB/s) at
    EVERY structure tried: fori_loop with dynamic slot math, full static
    unroll, G=16 vs G=64 per program (512 vs 128 grid programs), 2-group
    rotating buffers.  XLA's gather lowering moves the same 134 MB at
    ~45 ns per 2 KB row (~46 GB/s) — the gather unit out-issues
    explicitly-programmed DMAs ~16×, replicating round 2's per-row-DMA
    verdict (gather_dist.py) at 8× the transfer size and with the score
    fused.  DMA-only ≈ compute-only ≈ full also shows the two sides do
    not overlap at this issue rate.
  - Conclusion (second structure, same answer): on this chip the packed
    engine's payload fetch belongs to XLA's gather; custom fetch paths
    lose on descriptor rate, not bandwidth.  The engine therefore keeps
    optimizing for FEWER gathered bytes (seeding, compaction, payload
    width) rather than a custom fetch.

Kept as the measurement harness backing that claim (same disposition as
ops/pallas/gather_dist.py).

Semantics: dot[b, e·deg + j] = Σ_d pay_row(nodes[b,e], j)[d] · q16[b, d];
rows of nodes[b,e] < 0 fetch slab 0 and produce garbage — the caller masks
candidate ids of sentinel expansions, making their distances irrelevant —
so the DMA pipeline stays branch-free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: queries per grid program: q loads / out stores are [G, 128] aligned
#: tiles, and the one MXU contraction per program is [G, d]·[d, G·E·deg]
G = 64


def _score_kernel(nodes_ref, q_ref, pay_hbm, out_ref, scratch, sems,
                  *, e: int, deg: int, d_pad: int, mode: str = "full"):
    """One grid program: G queries × e node-slabs each, fully unrolled.

    nodes_ref: i32[G, e] (SMEM) — node ids (<0: garbage-tolerated)
    q_ref:     bf16[G, d_pad] (VMEM) — quantized queries, bf16
    pay_hbm:   int8[N·deg, d_pad] (ANY/HBM) — one [deg, d_pad] slab per node
    out_ref:   f32[G, e·deg] (VMEM) — dot products
    scratch:   int8[G·e·deg, d_pad] (VMEM) slab landing buffer
    sems:      DMA semaphores [G·e]
    """
    dma_on = mode in ("full", "dma")
    compute_on = mode in ("full", "compute")
    max_base = pay_hbm.shape[0] - deg

    def slab_dma(j, ei):
        node = nodes_ref[j, ei]
        base = jnp.clip(node * deg, 0, max_base)
        slot = j * e + ei
        return pltpu.make_async_copy(
            pay_hbm.at[pl.ds(pl.multiple_of(base, deg), deg), :],
            scratch.at[pl.ds(slot * deg, deg), :],
            sems.at[slot],
        )

    if dma_on:
        for j in range(G):          # static unroll: issue all G·e slabs
            for ei in range(e):
                slab_dma(j, ei).start()
        for j in range(G):
            for ei in range(e):
                slab_dma(j, ei).wait()

    if compute_on:
        # ONE MXU contraction for the whole group: [G, d]·[G·e·deg, d]ᵀ.
        # Only the per-query diagonal blocks are wanted; the 16× extra MXU
        # work is free next to 16 serial tiny dots (measured).
        allv = scratch[:].astype(jnp.bfloat16)          # [G·e·deg, d_pad]
        res = jax.lax.dot_general(
            q_ref[:], allv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                               # [G, G·e·deg]
        width = e * deg
        rows = [res[j:j + 1, j * width:(j + 1) * width] for j in range(G)]
        out_ref[:] = jnp.concatenate(rows, axis=0)
    else:
        out_ref[:] = jnp.zeros_like(out_ref)


@partial(jax.jit, static_argnames=("deg", "d_pad", "mode"))
def payload_score(pay, nodes, q16, deg: int, d_pad: int,
                  mode: str = "full", tb: int = G):
    """dot f32[B, E·deg] of each node's inlined int8 neighbors against its
    query (bf16 MXU contraction), payload slabs DMA'd HBM→VMEM.

    pay:   int8[N·C, W] with C·W = deg·d_pad per node (any chunking —
           reshaped to [N·deg, d_pad] slabs, a free row-major reshape)
    nodes: i32[B, E]
    q16:   bf16[B, d_pad]
    """
    b, e = nodes.shape
    n_nodes = (pay.shape[0] * pay.shape[1]) // (deg * d_pad)
    pay = pay.reshape(n_nodes * deg, d_pad)
    assert b % G == 0, b
    grid = (b // G,)
    kernel = partial(_score_kernel, e=e, deg=deg, d_pad=d_pad, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G, e), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((G, d_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # payload stays in HBM
        ],
        out_specs=pl.BlockSpec((G, e * deg), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e * deg), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((G * e * deg, d_pad), jnp.int8),
            pltpu.SemaphoreType.DMA((G * e,)),
        ],
    )(nodes, q16, pay)
