"""Pallas TPU kernel: int8-quantized distance matmul with fused block
reduction — BASELINE config 4's "quantized distance matmuls in Pallas".

One program computes a [TN, TB] tile of database↔query scores as an int8×int8
MXU matmul (int32 accumulate, one f32 rescale by the per-query × per-vector
symmetric scales) and immediately reduces it to per-G-block (min, argmin)
pairs — the full [B, N] score matrix is never materialized in HBM (at B=4096,
N=10M it would be 160 GB).  The caller selects the top-R blocks by min with
the TPU's hardware `approx_min_k` and exact-reranks only those R
representative rows.

Mosaic-shaped details (learned the hard way):
- the score tile is computed *transposed* ([TN, TB]) so the G-block split is
  a reshape of the leading dim — splitting the minor (lane) dim is an
  "unsupported shape cast", and strided slices only allow stride 1;
- int8 VMEM tiles are (32, 128)-aligned; TB=256, TN=4096, D multiple of 128;
- the in-kernel argmin is value-correct but breaks ties differently from
  numpy's first-index rule (irrelevant here: any representative of the block
  minimum works, and the rerank rescores exactly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401 (VMEM specs)


def _kernel(q_ref, qs_ref, x_ref, xs_ref, xn_ref, min_ref, arg_ref, *,
            block_g: int, tn: int, metric: str):
    tb = q_ref.shape[0]
    nb = tn // block_g
    dot = jax.lax.dot_general(
        x_ref[:], q_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [TN, TB] transposed scores
    scale = xs_ref[:, 0][:, None] * qs_ref[:, 0][None, :]
    fdot = dot.astype(jnp.float32) * scale
    if metric == "l2":
        scores = xn_ref[:, 0][:, None] - 2.0 * fdot  # +‖q‖² is rank-invariant
    else:
        # xn carries the mask bias (+inf on deleted/empty slots) for ip/cosine
        scores = xn_ref[:, 0][:, None] - fdot
    s3 = scores.reshape(nb, block_g, tb)  # leading-dim split: supported cast
    min_ref[:] = jnp.min(s3, axis=1)
    local = jnp.argmin(s3, axis=1).astype(jnp.int32)  # [NB, TB]
    j = pl.program_id(1)
    base = j * tn + jax.lax.broadcasted_iota(jnp.int32, (nb, tb), 0) * block_g
    arg_ref[:] = base + local


@partial(
    jax.jit,
    static_argnames=("block_g", "tb", "tn", "metric", "interpret"),
)
def int8_scan_blockmin(
    q_i8,  # i8[B, D] quantized queries
    q_scale,  # f32[B]
    x_i8,  # i8[N, D] quantized database
    x_scale,  # f32[N]
    x_norms,  # f32[N]  ‖x̂‖² of dequantized rows / mask bias (+inf = masked)
    block_g: int = 32,
    tb: int = 256,
    tn: int = 2048,
    metric: str = "l2",
    interpret: bool = False,
):
    """Returns (block_min f32[N/G, B], block_argmin i32[N/G, B]) —
    note the transposed layout (see module docstring)."""
    b, d = q_i8.shape
    n = x_i8.shape[0]
    assert b % tb == 0 and n % tn == 0 and tn % block_g == 0
    nb = tn // block_g
    grid = (b // tb, n // tn)
    return pl.pallas_call(
        partial(_kernel, block_g=block_g, tn=tn, metric=metric),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, tb), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, tb), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n // block_g, b), jnp.float32),
            jax.ShapeDtypeStruct((n // block_g, b), jnp.int32),
        ],
        interpret=interpret,
    )(q_i8, q_scale[:, None], x_i8, x_scale[:, None], x_norms[:, None])


@partial(
    jax.jit,
    static_argnames=("k", "rerank_k", "block_g", "metric", "interpret"),
)
def int8_flat_search(
    flat,  # FlatTensors with int8 scan
    queries,  # f32[B, D]
    k: int,
    metric: str,
    rerank_k: int = 64,
    block_g: int = 32,
    interpret: bool = False,
):
    """Flat search through the Pallas int8 kernel: block-min scan →
    approx_min_k over block minima → exact rerank of the block argmins.
    Returns (ids i32[B, k], dists f32[B, k])."""
    from ocaml_hnsw_tpu.models.search import preprocess_queries
    from ocaml_hnsw_tpu.ops.distance import INF, HIGHEST

    q = preprocess_queries(queries, metric)
    b0 = q.shape[0]
    tb = 256
    if b0 % tb:  # pad the query batch to the kernel's B-tile
        q = jnp.pad(q, ((0, tb - b0 % tb), (0, 0)))
    qmax = jnp.max(jnp.abs(q), axis=1)
    qs = jnp.where(qmax > 0, qmax / 127.0, 1.0)
    qi = jnp.clip(jnp.round(q / qs[:, None]), -127, 127).astype(jnp.int8)

    # tombstones/empty slots: a +inf additive bias keeps them out of every
    # block min (flat.norms is already +inf on unoccupied slots for l2)
    if metric == "l2":
        norms = jnp.where(flat.deleted, jnp.inf, flat.norms)
    else:
        occupied = jnp.arange(flat.n_cap) < flat.n
        norms = jnp.where(flat.deleted | ~occupied, jnp.inf, 0.0)
    bmin, barg = int8_scan_blockmin(
        qi, qs, flat.scan, flat.scales, norms,
        block_g=block_g, metric=metric, interpret=interpret,
    )
    bmin = bmin.T  # [B, N/G]
    barg = barg.T
    rerank_k = max(k, min(rerank_k, bmin.shape[1]))
    _, bidx = jax.lax.approx_min_k(bmin, rerank_k, recall_target=0.95)
    ids = jnp.take_along_axis(barg, bidx, axis=1)  # [B, R] candidate ids

    rows = flat.rerank[jnp.maximum(ids, 0)].astype(jnp.float32)
    if metric == "l2":
        diff = rows - q[:, None, :]
        d = jnp.sum(diff * diff, axis=-1)
    else:
        d = 1.0 - jnp.einsum("bkd,bd->bk", rows, q, precision=HIGHEST)
    d = jnp.where(flat.deleted[jnp.maximum(ids, 0)] | (ids >= flat.n), INF, d)
    neg, idx = jax.lax.top_k(-d, k)
    out_d = -neg
    out_ids = jnp.where(jnp.isinf(out_d),
                        -1, jnp.take_along_axis(ids, idx, axis=1))
    return out_ids[:b0], out_d[:b0]
