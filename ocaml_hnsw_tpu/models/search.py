"""Batched HNSW search on TPU — the reference's L2 hot loops (SURVEY.md §3.2/3.3)
re-designed as lockstep tensor programs.

The OCaml reference's `search_layer` pops one candidate from a heap, chases its
adjacency pointers, and pushes survivors back (SURVEY.md §3.3).  Here, B queries
advance together under one `lax.while_loop`:

  per iteration (SURVEY.md §7 step 2, "batched frontier expansion"):
    1. each query selects its nearest *unexpanded* beam entry (masked argmin —
       replaces the candidate min-heap pop),
    2. gathers that node's adjacency row (i32[B, deg] — replaces pointer chase),
    3. filters by a dense visited bitset (test + scatter-or set),
    4. computes the [B, deg] distance block as gathers + one MXU contraction,
    5. merges candidates into the beam with `lax.top_k` (replaces both heaps).

  A query whose beam is fully expanded simply stops contributing work; the loop
  ends when every query converges (beam divergence is amortized across the
  batch — SURVEY.md §7 "hard parts").

Beam semantics: this is the bounded best-first variant (beam of ef, expand
nearest unexpanded member).  Paper Alg 2 additionally keeps already-evicted
candidates in its heap, but never expands one that is farther than the current
ef-th best — the same stopping frontier — so recall matches the sequential
oracle at equal (M, ef); parity is enforced by tests/test_search.py.

Upper layers use pure greedy descent (Alg 5's ef=1 loop).  Greedy moves only on
strict improvement, so no visited set is needed there (distance strictly
decreases ⇒ no cycles) — saving a full bitset clear per layer.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.models.graph import GraphTensors
from ocaml_hnsw_tpu.ops.distance import dists_to_ids, query_norms, INF
from ocaml_hnsw_tpu.ops.bitset import (
    bitset_new,
    bitset_test,
    bitset_set,
    first_occurrence_mask,
)


def _greedy_level(vectors, norms, adj, q, qn, cur, cur_d, enabled, metric):
    """One layer of greedy ef=1 descent for B queries (Alg 5 upper loop).

    adj: i32[N_cap, deg] for this layer.  Returns (cur, cur_d) moved to the
    local minimum reachable by strictly-improving steps.
    """

    def cond(state):
        _, _, active = state
        return jnp.any(active)

    def body(state):
        cur, cur_d, active = state
        nbrs = adj[jnp.maximum(cur, 0)]  # [B, deg]
        nbrs = jnp.where(active[:, None], nbrs, -1)
        d = dists_to_ids(vectors, norms, q, qn, nbrs, metric)
        bi = jnp.argmin(d, axis=1)
        bd = jnp.take_along_axis(d, bi[:, None], axis=1)[:, 0]
        bid = jnp.take_along_axis(nbrs, bi[:, None], axis=1)[:, 0]
        better = active & (bd < cur_d)
        return (
            jnp.where(better, bid, cur),
            jnp.where(better, bd, cur_d),
            better,
        )

    cur, cur_d, _ = jax.lax.while_loop(cond, body, (cur, cur_d, enabled))
    return cur, cur_d


def beam_search_layer(
    vectors,
    norms,
    adj,  # i32[N_cap, deg] adjacency of the layer being searched
    q,  # f32[B, D]
    qn,  # f32[B]
    entry_ids,  # i32[B, E0]  (-1 padded)
    entry_d,  # f32[B, E0]  (+inf at sentinel)
    ef: int,
    metric: str,
    max_iters: int | None = None,
):
    """Beam search one layer for B queries; returns (ids, d): i32/f32[B, ef],
    sorted ascending by distance, -1/+inf padded."""
    b = q.shape[0]
    n_cap = vectors.shape[0]
    e0 = entry_ids.shape[1]

    # Entries may repeat across queries' E0 slots; dedup within row.
    uniq = first_occurrence_mask(entry_ids) & (entry_ids >= 0)
    entry_ids = jnp.where(uniq, entry_ids, -1)
    entry_d = jnp.where(uniq, entry_d, INF)

    visited = bitset_set(bitset_new(b, n_cap), entry_ids, uniq)

    # Initial beam = best ef of the (padded) entries.
    pad = max(ef - e0, 0)
    all_d = jnp.pad(entry_d, ((0, 0), (0, pad)), constant_values=jnp.inf)
    all_ids = jnp.pad(entry_ids, ((0, 0), (0, pad)), constant_values=-1)
    neg, idx = jax.lax.top_k(-all_d, ef)
    beam_d = -neg
    beam_ids = jnp.take_along_axis(all_ids, idx, axis=1)
    beam_exp = beam_ids < 0  # sentinels count as already expanded

    def cond(state):
        _, _, beam_exp, _, it = state
        live = jnp.any(~beam_exp)
        if max_iters is not None:
            live &= it < max_iters
        return live

    def body(state):
        beam_ids, beam_d, beam_exp, visited, it = state
        # 1. select nearest unexpanded beam member per query (heap-pop analog)
        sel_d = jnp.where(beam_exp, INF, beam_d)
        sel = jnp.argmin(sel_d, axis=1)  # [B]
        active = jnp.take_along_axis(sel_d, sel[:, None], axis=1)[:, 0] < INF
        node = jnp.take_along_axis(beam_ids, sel[:, None], axis=1)[:, 0]
        beam_exp = beam_exp.at[jnp.arange(b), sel].set(True)
        # 2. frontier expansion: adjacency gather
        nbrs = adj[jnp.maximum(node, 0)]  # [B, deg]
        nbrs = jnp.where(active[:, None], nbrs, -1)
        # 3. visited filter + mark
        fresh = (
            (nbrs >= 0) & ~bitset_test(visited, nbrs) & first_occurrence_mask(nbrs)
        )
        visited = bitset_set(visited, nbrs, fresh)
        cand_ids = jnp.where(fresh, nbrs, -1)
        # 4. distance block (gather + MXU contraction)
        cand_d = dists_to_ids(vectors, norms, q, qn, cand_ids, metric)
        # 5. beam merge via top-k (replaces both heaps)
        m_ids = jnp.concatenate([beam_ids, cand_ids], axis=1)
        m_d = jnp.concatenate([beam_d, cand_d], axis=1)
        m_exp = jnp.concatenate([beam_exp, ~fresh], axis=1)
        neg, idx = jax.lax.top_k(-m_d, ef)
        return (
            jnp.take_along_axis(m_ids, idx, axis=1),
            -neg,
            jnp.take_along_axis(m_exp, idx, axis=1),
            visited,
            it + 1,
        )

    beam_ids, beam_d, beam_exp, visited, _ = jax.lax.while_loop(
        cond, body, (beam_ids, beam_d, beam_exp, visited, jnp.int32(0))
    )
    return beam_ids, beam_d


def descend(graph: GraphTensors, q, qn, metric: str, stop_level: int = 0):
    """Greedy descent from the top layer down to stop_level+1 (Alg 5 upper part).

    Returns (cur, cur_d): the per-query entry point for layer `stop_level`.
    The layer stack height is static (adj_upper.shape[0]); layers above the
    live max_level are masked out, 'unrolled as a lax.while over the layer
    stack' per the north-star (here: unrolled statically, one bounded greedy
    while per layer — upper layers hold ~N/M^ℓ nodes so each is short).
    """
    b = q.shape[0]
    cur = jnp.broadcast_to(graph.entry, (b,)).astype(jnp.int32)
    cur_d = dists_to_ids(graph.vectors, graph.norms, q, qn, cur[:, None], metric)[:, 0]
    for li in range(graph.l_max, stop_level, -1):
        enabled = jnp.broadcast_to(li <= graph.max_level, (b,))
        cur, cur_d = _greedy_level(
            graph.vectors,
            graph.norms,
            graph.adj_upper[li - 1],
            q,
            qn,
            cur,
            cur_d,
            enabled,
            metric,
        )
    return cur, cur_d


def preprocess_queries(q, metric: str):
    """Match the oracle's query prep: cosine normalizes at query time."""
    q = q.astype(jnp.float32)
    if metric == "cosine":
        n = jnp.linalg.norm(q, axis=-1, keepdims=True)
        q = q / jnp.where(n == 0, 1.0, n)
    return q


@partial(jax.jit, static_argnames=("k", "ef", "metric", "max_iters"))
def knn_search(
    graph: GraphTensors,
    queries,  # f32[B, D]
    k: int,
    ef: int,
    metric: str,
    max_iters: int | None = None,
):
    """Full Alg 5: greedy descent through upper layers, then an ef-wide beam at
    layer 0; returns (ids i32[B, k], dists f32[B, k]) ascending, -1/inf padded.
    Tombstoned nodes are traversed but filtered from results (hnswlib
    mark_deleted semantics)."""
    ef = max(ef, k)
    q = preprocess_queries(queries, metric)
    qn = query_norms(q, metric)
    cur, cur_d = descend(graph, q, qn, metric, stop_level=0)
    ids, d = beam_search_layer(
        graph.vectors,
        graph.norms,
        graph.adj0,
        q,
        qn,
        cur[:, None],
        cur_d[:, None],
        ef,
        metric,
        max_iters,
    )
    # tombstone filter, then final top-k (beam is sorted but masking reorders)
    dead = graph.deleted[jnp.maximum(ids, 0)] | (ids < 0)
    d = jnp.where(dead, INF, d)
    neg, idx = jax.lax.top_k(-d, k)
    out_d = -neg
    out_ids = jnp.take_along_axis(ids, idx, axis=1)
    out_ids = jnp.where(jnp.isinf(out_d), -1, out_ids)
    return out_ids, out_d
