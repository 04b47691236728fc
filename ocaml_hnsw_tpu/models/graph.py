"""Device-resident index state: the reference's L1 "layered graph" (SURVEY.md
§1) re-designed as fixed-degree dense tensors in HBM.

The OCaml reference stores per-node neighbor *sets* behind pointers; a TPU
cannot chase pointers, so each layer is one int32[N_cap, degree] matrix with
-1 sentinels in empty slots (SURVEY.md §7 "Data layout").  Upper layers
(holding ~N/M^ℓ nodes, paper §4.1) reuse global node ids; a node participates
in layer ℓ iff levels[id] >= ℓ.

Everything here is a plain NamedTuple → a JAX pytree that flows through jit,
shard_map, and checkpointing unchanged.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ocaml_hnsw_tpu.config import HnswConfig
from ocaml_hnsw_tpu.utils import round_up, pad_to


class GraphTensors(NamedTuple):
    """The whole index as arrays.  Shapes use N_cap = padded capacity.

    vectors:   [N_cap, D] in the configured storage dtype — f32 (default),
               bf16, or int8 (symmetric per-vector quantization; the int8
               distance path is BASELINE config 4).  The dtype selects the
               distance path in ops/distance.py.  cosine rows pre-normalized
               (before quantization); padding rows zero.
    scales:    f32[N_cap]    per-vector dequant scale (ones for f32/bf16)
    norms:     f32[N_cap]    ||x̂||² of the *dequantized* vector (zeros for
               ip/cosine) so l2 matmul-form paths stay consistent
    adj0:      i32[N_cap, M_max0]        layer-0 adjacency, -1 padded
    adj_upper: i32[L_max, N_cap, M_max]  layers 1..L_max, -1 padded
    levels:    i32[N_cap]    node level; -1 marks an unoccupied slot
    entry:     i32[]         entry point id (-1 while empty)
    max_level: i32[]         current top layer
    n:         i32[]         number of occupied slots
    deleted:   bool[N_cap]   tombstones (hnswlib mark_deleted semantics)
    """

    vectors: jnp.ndarray
    scales: jnp.ndarray
    norms: jnp.ndarray
    adj0: jnp.ndarray
    adj_upper: jnp.ndarray
    levels: jnp.ndarray
    entry: jnp.ndarray
    max_level: jnp.ndarray
    n: jnp.ndarray
    deleted: jnp.ndarray

    @property
    def n_cap(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    @property
    def l_max(self) -> int:
        return self.adj_upper.shape[0]


def capacity(max_elements: int) -> int:
    """Pad capacity to a multiple of 128 (bitset words + lane alignment)."""
    return round_up(max(max_elements, 128), 128)


def empty_graph(config: HnswConfig, max_elements: int) -> GraphTensors:
    from ocaml_hnsw_tpu.ops.quantize import storage_dtype

    n_cap = capacity(max_elements)
    l_max = config.derived_max_level(max_elements)
    return GraphTensors(
        vectors=jnp.zeros((n_cap, config.dim), storage_dtype(config.storage)),
        scales=jnp.ones((n_cap,), jnp.float32),
        norms=jnp.zeros((n_cap,), jnp.float32),
        adj0=jnp.full((n_cap, config.M_max0), -1, jnp.int32),
        adj_upper=jnp.full((l_max, n_cap, config.M), -1, jnp.int32),
        levels=jnp.full((n_cap,), -1, jnp.int32),
        entry=jnp.int32(-1),
        max_level=jnp.int32(-1),
        n=jnp.int32(0),
        deleted=jnp.zeros((n_cap,), jnp.bool_),
    )


def from_oracle(oracle, max_elements: int | None = None) -> GraphTensors:
    """Convert an OracleHNSW (SURVEY.md §4 parity-oracle) into device tensors."""
    cfg: HnswConfig = oracle.config
    n = oracle.element_count
    n_cap = capacity(max_elements or n)
    l_max = cfg.derived_max_level(max_elements or max(n, 2))
    d = cfg.dim

    from ocaml_hnsw_tpu.ops.quantize import quantize_rows, storage_dtype

    vectors_f = np.zeros((n_cap, d), np.float32)
    if n:
        vectors_f[:n] = np.stack(oracle.vectors)
    qrows, qscales, qnorms = quantize_rows(jnp.asarray(vectors_f), cfg.storage)
    vectors = np.asarray(qrows)
    scales = np.asarray(qscales)
    from ocaml_hnsw_tpu.ops.metrics import get_metric

    if get_metric(cfg.metric).needs_norms:
        norms = np.asarray(qnorms)
    else:
        norms = np.zeros((n_cap,), np.float32)

    adj0 = np.full((n_cap, cfg.M_max0), -1, np.int32)
    adj_upper = np.full((l_max, n_cap, cfg.M), -1, np.int32)
    levels = np.full((n_cap,), -1, np.int32)
    for i in range(n):
        levels[i] = min(oracle.levels[i], l_max)
        for lc, nbrs in enumerate(oracle.adj[i]):
            if lc == 0:
                adj0[i] = pad_to(np.asarray(nbrs, np.int32), cfg.M_max0, -1)
            elif lc <= l_max:
                adj_upper[lc - 1, i] = pad_to(np.asarray(nbrs, np.int32), cfg.M, -1)

    deleted = np.zeros((n_cap,), np.bool_)
    for e in oracle.deleted:
        deleted[e] = True

    return GraphTensors(
        vectors=jnp.asarray(vectors),
        scales=jnp.asarray(scales),
        norms=jnp.asarray(norms),
        adj0=jnp.asarray(adj0),
        adj_upper=jnp.asarray(adj_upper),
        levels=jnp.asarray(levels),
        entry=jnp.int32(oracle.entry),
        max_level=jnp.int32(min(max(oracle.max_level, 0), l_max) if n else -1),
        n=jnp.int32(n),
        deleted=jnp.asarray(deleted),
    )
