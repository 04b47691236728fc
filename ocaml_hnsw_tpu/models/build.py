"""Batched parallel index construction on TPU (SURVEY.md §7 step 4).

The reference builds its graph by folding a sequential `insert` over the
dataset in one thread (SURVEY.md §3.1).  Here construction runs as *rounds* of
R simultaneous inserts, all inside one jitted step:

  1. levels for every point are pre-sampled on the host from the seeded RNG
     (identical stream to the oracle's, Alg 1's only randomness),
  2. each round searches the **pre-round graph snapshot** for all R points at
     once — greedy descent above each point's level, then an ef_construction
     beam per layer (reusing the query engine's kernels),
  3. the select-neighbors heuristic (Alg 4) is vectorized: the O(|C|·M)
     pairwise-distance loop becomes one [R, K, K] batched matmul plus a
     fixed-length admit scan,
  4. edges are applied with **conflict-free deterministic scatter**: forward
     rows are unique by construction; reverse edges get per-target slots from
     a column-by-column running counter (nearest-first, since selection
     columns are distance-ascending), and over-full rows are re-pruned with
     the same heuristic (Alg 1's shrink) — SURVEY.md §5.2's "race surface" is
     closed by construction, verified by determinism tests.

Round sizes follow a doubling schedule capped at `round_size` so points only
ever connect to an already-dense snapshot; the jitted step has a single static
shape (rounds are padded and masked) so the whole build compiles once.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.config import HnswConfig
from ocaml_hnsw_tpu.models.graph import GraphTensors, empty_graph
from ocaml_hnsw_tpu.models.search import beam_search_layer, _greedy_level
from ocaml_hnsw_tpu.ops.distance import (
    dists_to_ids,
    gather_dequant,
    pairwise_dists,
    query_norms,
    INF,
)
from ocaml_hnsw_tpu.ops.quantize import quantize_rows
from ocaml_hnsw_tpu.utils import round_up


def upper_round_width(r: int, m: int, level: int) -> int:
    """Static row capacity for the packed upper-level connect stage: 4x the
    binomial expectation r/M^level (a +30σ-at-defaults margin; BuildState
    asserts the actual per-round count fits), floored at 64, capped at r."""
    want = max(64, (4 * r) // (m ** level))
    p = 1
    while p < want:
        p *= 2
    return min(p, r)


def seed_capacity(n_cap: int, m: int) -> int:
    """Static capacity for the build-time seed bank (ids of level>=1 nodes).

    Expected upper-node count is n/M (P(level>=1) = 1/M); 3x headroom makes
    binomial overflow negligible, capped at n_cap."""
    want = max(128, (3 * n_cap) // max(m, 2))
    p = 1
    while p < want:
        p *= 2
    return min(p, round_up(n_cap, 128))


# --------------------------------------------------------------------- levels
def sample_levels(rng: np.random.RandomState, n: int, m_l: float, cap: int):
    """level = ⌊−ln(U(0,1))·mL⌋ (Alg 1), same RNG stream as the oracle."""
    u = rng.uniform(size=n)
    return np.minimum((-np.log(1.0 - u) * m_l).astype(np.int32), cap)


# ------------------------------------------------------- heuristic (Alg 4)
def heuristic_admit(cand_d, pair_d, valid, m: int, keep_pruned: bool,
                    scan_limit: int | None = None):
    """Vectorized SELECT-NEIGHBORS-HEURISTIC admit loop.

    cand_d: f32[B, K] distances to the query point, **sorted ascending**.
    pair_d: f32[B, K, K] pairwise distances among candidates.
    Admit candidate j iff it is strictly closer to the query than to every
    already-admitted candidate (exactly the oracle's sequential order, run as
    a fixed-length scan).  Returns the admit mask bool[B, K].

    scan_limit caps the sequential scan depth (the loop is the only serial
    part of selection): candidates beyond that rank are never admitted.
    Admissions deeper than ~4M are rare, so a generous cap trades a hair of
    diversity for wall-clock — quality-checked by the build benchmarks.
    """
    b, k = cand_d.shape
    depth = k if scan_limit is None else min(k, scan_limit)

    def body(j, state):
        sel, cnt = state
        pj = jax.lax.dynamic_slice_in_dim(pair_d, j, 1, axis=1)[:, 0, :]
        dmin = jnp.min(jnp.where(sel, pj, INF), axis=1)
        dj = jax.lax.dynamic_slice_in_dim(cand_d, j, 1, axis=1)[:, 0]
        vj = jax.lax.dynamic_slice_in_dim(valid, j, 1, axis=1)[:, 0]
        admit = vj & (cnt < m) & (dj < dmin)
        sel = jax.lax.dynamic_update_slice_in_dim(
            sel, admit[:, None], j, axis=1
        )
        return sel, cnt + admit.astype(jnp.int32)

    sel, cnt = jax.lax.fori_loop(
        0, depth, body,
        (jnp.zeros((b, k), jnp.bool_), jnp.zeros((b,), jnp.int32)),
    )
    if keep_pruned:  # Alg 4 keepPrunedConnections: backfill nearest rejected
        free = m - cnt
        rej = valid & ~sel
        rank = jnp.cumsum(rej, axis=1)
        sel = sel | (rej & (rank <= free[:, None]))
    return sel


def compact_by_mask(ids, d, mask, m: int):
    """Pack masked entries left (stable) and truncate/pad to width m.

    Runs as a bitonic compare-exchange network on the slot index (stable:
    the key is the original position), not lax.top_k — top_k has a
    multi-millisecond floor per call on TPU and this helper runs many times
    per insert round."""
    from ocaml_hnsw_tpu.ops.sortmerge import bitonic_sort, next_pow2

    k = ids.shape[1]
    key = jnp.where(mask, jnp.arange(k, dtype=jnp.int32)[None, :], k + 1)
    p2 = next_pow2(k)
    if p2 > k:
        key = jnp.pad(key, ((0, 0), (0, p2 - k)), constant_values=k + 1)
        ids = jnp.pad(ids, ((0, 0), (0, p2 - k)), constant_values=-1)
        d = jnp.pad(d, ((0, 0), (0, p2 - k)), constant_values=jnp.inf)
    skey, (out_ids, out_d) = bitonic_sort(
        key.astype(jnp.float32), [ids, d], ascending=True
    )
    w = min(m, k)
    ok = skey[:, :w] <= k
    out_ids = jnp.where(ok, out_ids[:, :w], -1)
    out_d = jnp.where(ok, out_d[:, :w], INF)
    if m > k:
        out_ids = jnp.pad(out_ids, ((0, 0), (0, m - k)), constant_values=-1)
        out_d = jnp.pad(out_d, ((0, 0), (0, m - k)), constant_values=jnp.inf)
    return out_ids, out_d


def select_neighbors(vectors, scales, norms, w_ids, w_d, m: int, metric: str,
                     keep_pruned: bool, heuristic: bool = True,
                     scan_limit: int | None = None):
    """Neighbor selection over beam results (sorted ascending): Alg 4
    diversity pruning (default) or Alg 3 plain nearest-M (heuristic=False).
    Returns ids/d [B, m]."""
    valid = w_ids >= 0
    if not heuristic:  # Alg 3: the beam is distance-ascending already
        return compact_by_mask(w_ids, w_d, valid, m)
    safe = jnp.maximum(w_ids, 0)
    cvec = gather_dequant(vectors, scales, w_ids)
    cnorm = norms[safe]
    pair = pairwise_dists(cvec, cnorm, metric)
    sel = heuristic_admit(w_d, pair, valid, m, keep_pruned,
                          scan_limit=scan_limit)
    return compact_by_mask(w_ids, w_d, sel, m)


def extend_candidates(vectors, scales, norms, adj_l, q, qn, w_ids, w_d,
                      ef_l: int, metric: str):
    """Alg 4's extendCandidates flag, batched: widen the candidate pool with
    the beam members' own neighbors at this layer, then keep the nearest ef_l
    (deduplicated) as the new pool.

    Deviation from the sequential oracle (documented): the oracle's pool
    grows unboundedly to |W|·(deg+1); here it is truncated to the nearest
    ef_l after extension so shapes stay static.  Selection admits at most
    M ≪ ef_l nearest-diverse candidates, so the truncation is outside the
    admitted region in practice (recall parity is covered by tests)."""
    r = w_ids.shape[0]
    nb = adj_l[jnp.maximum(w_ids, 0)]  # [R, ef_l, deg]
    nb = jnp.where((w_ids >= 0)[:, :, None], nb, -1).reshape(r, -1)
    all_ids = jnp.concatenate([w_ids, nb], axis=1)
    d_all = dists_to_ids(vectors, scales, norms, q, qn, all_ids, metric)
    kk = min(2 * ef_l, all_ids.shape[1])
    neg, idx = jax.lax.top_k(-d_all, kk)
    t_ids = jnp.take_along_axis(all_ids, idx, axis=1)
    t_d = -neg
    from ocaml_hnsw_tpu.ops.bitset import first_occurrence_mask

    uniq = first_occurrence_mask(t_ids) & (t_ids >= 0)
    return compact_by_mask(t_ids, t_d, uniq, ef_l)


# ------------------------------------------------------------- edge updates
def apply_edges(
    adj,  # i32[N_cap, m_cap] one layer's adjacency
    vectors,
    scales,
    norms,
    p_ids,  # i32[R] new point ids (unique)
    sel_ids,  # i32[R, M] chosen neighbors (-1 padded)
    sel_d,  # f32[R, M]
    mask,  # bool[R] point participates at this layer
    m_cap: int,
    rev_cap: int,
    metric: str,
    keep_pruned: bool,
    pad_row: int,  # reserved never-occupied row used as scatter sink
    heuristic: bool = True,
):
    """Forward + reverse edge application with deterministic conflict handling.

    Reverse edges targeting the same node get slots from a per-target running
    counter (column order ≈ nearest first), capped at rev_cap per round, then
    merged into the target's row: plain append when it fits (sequential Alg 1
    semantics), heuristic re-prune (Alg 1's shrink) when over-full.  The
    result is a pure function of the round's inputs — intra-round point order
    cannot matter.
    """
    r, m = sel_ids.shape
    n_cap = adj.shape[0]

    # ---- forward rows (unique p_ids ⇒ conflict-free scatter)
    fwd = jnp.pad(sel_ids, ((0, 0), (0, m_cap - m)), constant_values=-1)
    rows = jnp.where(mask[:, None], fwd, adj[p_ids])
    adj = adj.at[p_ids].set(rows)

    # ---- reverse pairs (e ← p), grouped by target.
    # Slot assignment runs column-by-column with a running per-target counter
    # instead of a global (target, distance) lexsort: 1-D sorts/scans on TPU
    # are serial (a 65k-element lexsort measured 1.8s — more than the whole
    # beam search).  Columns of sel_ids are distance-ascending (selection is
    # compacted nearest-first), so column order ≈ nearest-first per target and
    # the rev_cap drop still sheds the farthest edges; the result is a pure
    # function of (sel_ids, p_ids) — intra-round order still can't matter.
    pair_valid = mask[:, None] & (sel_ids >= 0)
    e_cols = jnp.where(pair_valid, sel_ids, pad_row)  # [R, M]
    cnt = jnp.zeros((n_cap,), jnp.int32)
    rev = jnp.full((n_cap, rev_cap), -1, jnp.int32)
    for j in range(m):
        e_col = e_cols[:, j]  # [R]
        valid = e_col != pad_row
        base = cnt[e_col]
        # rank among duplicates of the same target within this column
        same = (e_col[None, :] == e_col[:, None]) & valid[:, None]
        dup_rank = jnp.sum(same & (jnp.arange(r)[None, :] <
                                   jnp.arange(r)[:, None]), axis=1)
        pos = base + dup_rank
        keep = valid & (pos < rev_cap)
        rev = rev.at[
            jnp.where(keep, e_col, pad_row), jnp.where(keep, pos, 0)
        ].max(jnp.where(keep, p_ids, -1))
        cnt = cnt.at[e_col].add(valid.astype(jnp.int32))

    # ---- affected target rows: the flattened pair targets themselves.
    # Duplicates (same target hit by several new points) all recompute the
    # identical merged row and scatter identical values — deterministic — and
    # the width equals the nonzero() padding this replaces, so skipping the
    # O(n_cap) nonzero scan (measured 18 ms at 1M) is a strict win.
    aff = e_cols.reshape(-1)  # [R*M] with dups; pad_row on invalid pairs

    old = adj[aff]  # [A, m_cap]
    new_ps = rev[aff]  # [A, rev_cap]
    combined = jnp.concatenate([old, new_ps], axis=1)  # [A, K2]
    cvalid = combined >= 0
    overflow = jnp.sum(cvalid, axis=1) > m_cap

    # append path: old entries first, then the new ones, packed
    evec = gather_dequant(vectors, scales, aff[:, None])[:, 0, :]
    enorm = norms[aff]
    dcomb = dists_to_ids(
        vectors, scales, norms, evec, enorm,
        jnp.where(cvalid, combined, -1), metric
    )
    app_ids, _ = compact_by_mask(combined, dcomb, cvalid, m_cap)

    # shrink path: re-prune over old ∪ new, sorted by distance — Alg 4
    # heuristic by default, plain nearest-m_cap under select="simple".
    # Distance sort as a bitonic network (XLA's variadic sort is serial-ish
    # on TPU; the network is pure VPU compare-exchange).
    from ocaml_hnsw_tpu.ops.sortmerge import bitonic_sort, next_pow2

    k2 = combined.shape[1]
    p2 = next_pow2(k2)
    sd_in = jnp.where(cvalid, dcomb, INF)
    si_in = combined
    if p2 > k2:
        sd_in = jnp.pad(sd_in, ((0, 0), (0, p2 - k2)),
                        constant_values=jnp.inf)
        si_in = jnp.pad(si_in, ((0, 0), (0, p2 - k2)), constant_values=-1)
    sc_d, (sc_ids,) = bitonic_sort(sd_in, [si_in], ascending=True)
    sc_d = sc_d[:, :k2]
    sc_ids = sc_ids[:, :k2]
    sc_valid = sc_ids >= 0
    if heuristic:
        svec = gather_dequant(vectors, scales, sc_ids)
        snorm = norms[jnp.maximum(sc_ids, 0)]
        # shrink-only pruning: 1-pass MXU precision — ~0.4% error flips only
        # near-tie diversity decisions, and these tiny batched matmuls at
        # 3-pass HIGHEST dominated the whole round (measured ~2s at R=2048)
        pair2 = pairwise_dists(svec, snorm, metric,
                               precision=jax.lax.Precision.DEFAULT)
        sel2 = heuristic_admit(sc_d, pair2, sc_valid, m_cap, keep_pruned)
    else:
        sel2 = sc_valid
    heur_ids, _ = compact_by_mask(sc_ids, sc_d, sel2, m_cap)

    new_rows = jnp.where(overflow[:, None], heur_ids, app_ids)
    # pad_row fill entries all compute the identical all--1 row → benign dups
    return adj.at[aff].set(new_rows)


# ------------------------------------------------------------- insert round
@partial(
    jax.jit,
    static_argnames=(
        "efc", "efc_upper", "m", "m_max0", "rev_cap", "metric",
        "keep_pruned", "storage", "round_top", "seed_e", "need_descent",
        "build_mi", "build_ck", "extend", "heuristic", "select_scan",
    ),
)
def insert_round(
    graph: GraphTensors,
    new_vecs,  # f32[R, D]  (already metric-prepped)
    new_levels,  # i32[R]
    start,  # i32 scalar: first slot id for this round
    count,  # i32 scalar: how many of the R rows are real
    seed_bank=None,  # i32[U_cap] ids of level>=1 nodes (pre-round snapshot)
    seed_n=None,  # i32 scalar: live entries in seed_bank
    *,
    efc: int,
    m: int,
    m_max0: int,
    rev_cap: int,
    metric: str,
    keep_pruned: bool,
    storage: str = "f32",
    efc_upper: int | None = None,
    round_top: int | None = None,
    seed_e: int = 16,
    need_descent: bool = True,
    build_mi: int | None = None,
    build_ck: int | None = None,
    extend: bool = False,
    heuristic: bool = True,
    select_scan: int | None = None,
):
    """One fully-batched insertion round (Alg 1 for R points against the
    pre-round snapshot).  R is static; real rounds are padded to R and masked.

    seed_bank/seed_n: the MXU entry-scan state (ids of all level>=1 nodes).
    When provided, layer<=1 beams start from the top-seed_e upper-layer nodes
    per point instead of the greedy-descent position — measured on v5e at 1M
    this converges the efc=200 level-0 beam in ~53 lockstep iterations vs 145
    (262 ms vs 844 ms per 2048-round) with 0.985 top-16 W-set overlap.  The
    bank is updated with the round's new upper nodes and returned.

    round_top: static max connect level of this round's points (host knows the
    sampled levels); layers above it skip their beam/select/apply stages
    entirely — most rounds top out at level 2-3 of a 5-layer stack.

    Returns (graph, seed_bank, seed_n)."""
    r = new_vecs.shape[0]
    n_cap = graph.n_cap
    l_max = graph.l_max
    pad_row = n_cap - 1
    # Upper layers hold ~N/M^l nodes and only route; a narrow beam there loses
    # nothing (selection still picks m of efc_upper) and the lockstep
    # while_loop converges in ~2·ef/expand iterations instead of 2·efc/expand.
    if efc_upper is None:
        efc_upper = min(efc, max(2 * m, 32))
    if round_top is None:
        round_top = l_max
    round_top = min(round_top, l_max)
    use_seeds = seed_bank is not None

    p_ids = (start + jnp.arange(r, dtype=jnp.int32)).astype(jnp.int32)
    valid = jnp.arange(r) < count

    # ---- place vectors / norms / levels (slots are unoccupied ⇒ safe)
    q = new_vecs.astype(jnp.float32)
    qn = query_norms(q, metric)
    qrows, qscales, qnorms_store = quantize_rows(q, storage)
    vectors = graph.vectors.at[p_ids].set(
        jnp.where(valid[:, None], qrows, graph.vectors[p_ids])
    )
    scales = graph.scales.at[p_ids].set(
        jnp.where(valid, qscales, graph.scales[p_ids])
    )
    from ocaml_hnsw_tpu.ops.metrics import get_metric

    norms_store = qnorms_store if get_metric(metric).needs_norms \
        else jnp.zeros_like(qnorms_store)
    norms = graph.norms.at[p_ids].set(
        jnp.where(valid, norms_store, graph.norms[p_ids])
    )
    levels = graph.levels.at[p_ids].set(jnp.where(valid, new_levels, -1))

    max_level_pre = graph.max_level
    connect_start = jnp.minimum(new_levels, max_level_pre)  # [R]

    # ---- MXU seed scan over the pre-round upper-node bank (layer<=1 entries)
    if use_seeds:
        u_cap = seed_bank.shape[0]
        safe_bank = jnp.maximum(seed_bank, 0)
        bank_vecs = gather_dequant(vectors, scales, safe_bank[None, :])[0]
        dot = jax.lax.dot_general(
            q.astype(jnp.bfloat16), bank_vecs.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        mm = get_metric(metric).matmul_score
        if mm is not None:
            bank_norms = jnp.sum(bank_vecs * bank_vecs, axis=1)
            scores = mm(dot, bank_norms[None, :])
        else:
            # registry metric without an MXU form: exact pair distances over
            # the bank (the bank rows are already gathered, so this is VPU
            # compute only — no extra HBM traffic)
            scores = get_metric(metric).pair_dist(bank_vecs[None], q)
        live = jnp.arange(u_cap) < seed_n
        scores = jnp.where(live[None, :], scores, jnp.inf)
        _, ii = jax.lax.approx_min_k(scores, seed_e)
        s_ids = jnp.where(live[ii], safe_bank[ii], -1)
        s_d = dists_to_ids(vectors, scales, norms, q, qn, s_ids, metric)
        have_seeds = seed_n > 0

    # ---- descend + connect, one static pass over the layer stack
    cur = jnp.broadcast_to(graph.entry, (r,)).astype(jnp.int32)
    cur_d = dists_to_ids(
        vectors, scales, norms, q, qn, cur[:, None], metric
    )[:, 0]
    ep_ids = jnp.full((r, efc_upper), -1, jnp.int32)
    ep_d = jnp.full((r, efc_upper), jnp.inf, jnp.float32)

    adj0 = graph.adj0
    adj_upper = graph.adj_upper

    def first_entries(cur_v, cur_dv, sids_v, sdv, width, at_seed_level):
        """Entry block for a point's FIRST connect layer: the greedy-descent
        position, upgraded to the seed-scan top-E at layers <= 1 (seed-bank
        nodes are level>=1, so they exist at layers 0 and 1)."""
        n_rows = cur_v.shape[0]
        f_ids = jnp.concatenate(
            [cur_v[:, None], jnp.full((n_rows, width - 1), -1, jnp.int32)],
            axis=1,
        )
        f_d = jnp.concatenate(
            [cur_dv[:, None], jnp.full((n_rows, width - 1), jnp.inf)], axis=1
        )
        if use_seeds and at_seed_level:
            pad_i = jnp.full((n_rows, width - seed_e), -1, jnp.int32)
            pad_dd = jnp.full((n_rows, width - seed_e), jnp.inf)
            f_ids = jnp.where(have_seeds,
                              jnp.concatenate([sids_v, pad_i], axis=1), f_ids)
            f_d = jnp.where(have_seeds,
                            jnp.concatenate([sdv, pad_dd], axis=1), f_d)
        return f_ids, f_d

    for level in range(l_max, -1, -1):
        adj_l = adj0 if level == 0 else adj_upper[level - 1]
        m_cap = m_max0 if level == 0 else m

        if level >= 1 and need_descent:
            # greedy descent through layers above connect_start (skippable
            # when seeds cover every entry: round_top_actual <= 1 and the
            # seed bank is non-empty — the caller knows both statically)
            greedy_on = valid & (level > connect_start) & (level <= max_level_pre)
            cur, cur_d = _greedy_level(
                vectors, scales, norms, adj_l, q, qn, cur, cur_d, greedy_on,
                metric
            )

        if level > round_top:
            continue  # no point in this round connects here

        if level >= 1:
            # ---- packed upper-level connect: only ~R/M^level points reach
            # this layer, so gather them into a narrow block (4x-expected
            # static width; BuildState asserts the actual count fits) and run
            # beam/select/apply at that width instead of full-R lockstep.
            r_l = upper_round_width(r, m, level)
            lvl_mask = valid & (connect_start >= level)
            (idx,) = jnp.nonzero(lvl_mask, size=r_l, fill_value=r)
            on = idx < r
            safe_idx = jnp.minimum(idx, r - 1)
            q_l = q[safe_idx]
            qn_l = qn[safe_idx]
            f_ids, f_d = first_entries(
                cur[safe_idx], cur_d[safe_idx],
                s_ids[safe_idx] if use_seeds else None,
                s_d[safe_idx] if use_seeds else None,
                efc_upper, level <= 1,
            )
            seeding = (connect_start[safe_idx] == level)[:, None]
            entry_ids = jnp.where(seeding, f_ids, ep_ids[safe_idx])
            entry_d = jnp.where(seeding, f_d, ep_d[safe_idx])
            entry_ids = jnp.where(on[:, None], entry_ids, -1)
            entry_d = jnp.where(on[:, None], entry_d, INF)

            w_ids, w_d, _ = beam_search_layer(
                vectors, scales, norms, adj_l, q_l, qn_l, entry_ids, entry_d,
                efc_upper, metric, expand=4, visited_bits=0,
            )
            # W becomes the next-lower layer's entry set for these points.
            # Fill rows scatter into a dedicated dump row (index r) so they
            # can never collide with a real row's write — a clamped fill
            # index could otherwise race the genuinely-active last row.
            scatter_idx = jnp.where(on, safe_idx, r)
            ep_ids = jnp.pad(ep_ids, ((0, 1), (0, 0)))
            ep_d = jnp.pad(ep_d, ((0, 1), (0, 0)))
            ep_ids = ep_ids.at[scatter_idx].set(w_ids)[:r]
            ep_d = ep_d.at[scatter_idx].set(w_d)[:r]

            if extend:
                c_ids, c_d = extend_candidates(
                    vectors, scales, norms, adj_l, q_l, qn_l, w_ids, w_d,
                    efc_upper, metric,
                )
            else:
                c_ids, c_d = w_ids, w_d
            sel_ids, sel_d = select_neighbors(
                vectors, scales, norms, c_ids, c_d, m, metric, keep_pruned,
                heuristic=heuristic,
            )
            p_ids_l = jnp.where(on, p_ids[safe_idx], pad_row)
            adj_l = apply_edges(
                adj_l, vectors, scales, norms, p_ids_l, sel_ids, sel_d, on,
                m_cap, rev_cap, metric, keep_pruned, pad_row,
                heuristic=heuristic,
            )
            adj_upper = adj_upper.at[level - 1].set(adj_l)
            continue

        # ---- level 0: full-width connect for every valid point
        seeding = (connect_start == 0)[:, None]
        f_ids, f_d = first_entries(
            cur, cur_d,
            s_ids if use_seeds else None,
            s_d if use_seeds else None,
            efc_upper, True,
        )
        entry_ids = jnp.where(seeding, f_ids, ep_ids)
        entry_d = jnp.where(seeding, f_d, ep_d)
        entry_ids = jnp.where(valid[:, None], entry_ids, -1)
        entry_d = jnp.where(valid[:, None], entry_d, INF)

        w_ids, w_d, _ = beam_search_layer(
            vectors, scales, norms, adj_l, q, qn, entry_ids, entry_d,
            efc, metric, expand=4, visited_bits=0,
            max_iters=build_mi, compact_k=build_ck,
        )
        if extend:
            c_ids, c_d = extend_candidates(
                vectors, scales, norms, adj_l, q, qn, w_ids, w_d, efc, metric,
            )
        else:
            c_ids, c_d = w_ids, w_d
        sel_ids, sel_d = select_neighbors(
            vectors, scales, norms, c_ids, c_d, m, metric, keep_pruned,
            heuristic=heuristic, scan_limit=select_scan,
        )
        adj0 = apply_edges(
            adj_l, vectors, scales, norms, p_ids, sel_ids, sel_d, valid,
            m_cap, rev_cap, metric, keep_pruned, pad_row,
            heuristic=heuristic,
        )

    # ---- entry point / max level (first-max ⇒ matches sequential ties)
    lv = jnp.where(valid, new_levels, -1)
    best = jnp.max(lv)
    bi = jnp.argmax(lv)
    raise_entry = best > max_level_pre
    entry = jnp.where(raise_entry, p_ids[bi], graph.entry).astype(jnp.int32)
    max_level = jnp.maximum(max_level_pre, best)

    out_graph = GraphTensors(
        vectors=vectors,
        scales=scales,
        norms=norms,
        adj0=adj0,
        adj_upper=adj_upper,
        levels=levels,
        entry=entry,
        max_level=max_level,
        n=graph.n + count.astype(jnp.int32),
        deleted=graph.deleted,
    )
    if not use_seeds:
        return out_graph, None, None

    # ---- append this round's new upper nodes to the seed bank
    is_up = valid & (new_levels >= 1)
    slot = seed_n + jnp.cumsum(is_up.astype(jnp.int32)) - 1
    keep = is_up & (slot < seed_bank.shape[0])
    seed_bank = seed_bank.at[
        jnp.where(keep, slot, seed_bank.shape[0] - 1)
    ].max(jnp.where(keep, p_ids, -1))
    # (capacity has 3x headroom over E[n/M]; silent drop beyond it only
    # degrades entry quality, never correctness)
    seed_n = seed_n + jnp.sum(keep.astype(jnp.int32))
    return out_graph, seed_bank, seed_n


# ---------------------------------------------------------------- bootstrap
def bootstrap(graph: GraphTensors, vec, level: int, metric: str,
              storage: str = "f32") -> GraphTensors:
    """Insert the very first point (no search needed — empty graph)."""
    q = jnp.asarray(vec, jnp.float32)[None, :]
    qrows, qscales, qnorms = quantize_rows(q, storage)
    if metric != "l2":
        qnorms = jnp.zeros_like(qnorms)
    return graph._replace(
        vectors=graph.vectors.at[0].set(qrows[0]),
        scales=graph.scales.at[0].set(qscales[0]),
        norms=graph.norms.at[0].set(qnorms[0]),
        levels=graph.levels.at[0].set(level),
        entry=jnp.int32(0),
        max_level=jnp.int32(level),
        n=jnp.int32(1),
    )


# ------------------------------------------------------------------- driver
class BuildState:
    """Host-side build driver: owns the RNG stream (level sampling is the only
    randomness, SURVEY.md §4) and the doubling round schedule."""

    def __init__(self, config: HnswConfig, max_elements: int,
                 round_size: int = 1024):
        self.config = config
        self.round_size = round_size
        # reserve headroom: one padded round may run past max_elements, and
        # the last row is the scatter sink (pad_row) — never occupied
        self.max_elements = max_elements
        n_cap_target = max_elements + round_size + 1
        self.graph = empty_graph(config, n_cap_target)
        self.l_max = self.graph.l_max
        self.rng = np.random.RandomState(config.seed)
        # reverse-edge candidates kept per target per round: the shrink
        # heuristic's pairwise matmul is O((m_cap + rev_cap)^2) per affected
        # row, and >M new back-edges landing on one node in one round is rare;
        # nearest-M semantics keep the drop deterministic.
        self.rev_cap = 8
        # MXU entry-scan state: ids of level>=1 nodes + live count, and a host
        # mirror of the graph's max level (for the static round_top)
        self.seed_bank = jnp.full(
            (seed_capacity(self.graph.n_cap, config.M),), -1, jnp.int32
        )
        self.seed_n = jnp.int32(0)
        self.host_max_level = -1
        self.host_upper_count = 0  # mirror of seed_n (descent-skip decision)
        # level-0 build-beam throughput knobs (see insert_round): candidate
        # compaction saved ~13% build time at 1M with zero measured recall
        # cost, so it defaults on for wide candidate blocks; iteration caps
        # measured recall-neutral but not faster, so build_mi stays None.
        self.build_mi: int | None = None
        self.select_scan: int | None = None
        self.build_ck: int | None = (
            (3 * 4 * config.M_max0) // 4 if 4 * config.M_max0 >= 128 else None
        )

    def prep(self, data):
        """Normalize at add time (cosine-style metrics) on whichever side the
        data lives."""
        from ocaml_hnsw_tpu.ops.metrics import get_metric

        normalize = get_metric(self.config.metric).normalize_add
        if isinstance(data, jnp.ndarray):
            if normalize:
                nrm = jnp.linalg.norm(data, axis=1, keepdims=True)
                data = data / jnp.where(nrm == 0, 1.0, nrm)
            return data.astype(jnp.float32)
        data = np.asarray(data, dtype=np.float32)
        if normalize:
            nrm = np.linalg.norm(data, axis=1, keepdims=True)
            data = data / np.where(nrm == 0, 1.0, nrm)
        return data

    def add(self, data) -> None:
        """Insert `data` (host numpy OR a device array — the latter avoids the
        slow host→device path entirely) via padded fixed-shape rounds."""
        cfg = self.config
        if int(self.graph.n) + data.shape[0] > self.max_elements:
            raise RuntimeError(
                f"index is full: {int(self.graph.n)} + {data.shape[0]} > "
                f"max_elements {self.max_elements}"
            )
        data = self.prep(data)
        on_device = isinstance(data, jnp.ndarray)
        n_new = data.shape[0]
        levels = sample_levels(self.rng, n_new, cfg.mL, self.l_max)
        if on_device:
            # pad once so fixed-size dynamic slices never overrun
            data = jnp.pad(data, ((0, self.round_size), (0, 0)))
        done = 0
        while done < n_new:
            n_cur = int(self.graph.n)
            if n_cur == 0:
                first = data[0] if not on_device else np.asarray(data[0])
                lvl0 = int(levels[0])
                self.graph = bootstrap(
                    self.graph, first, lvl0, cfg.metric,
                    storage=cfg.storage,
                )
                if lvl0 >= 1:
                    self.seed_bank = self.seed_bank.at[0].set(0)
                    self.seed_n = jnp.int32(1)
                    self.host_upper_count = 1
                self.host_max_level = lvl0
                done += 1
                continue
            # doubling schedule: never insert more than the snapshot size
            count = min(self.round_size, n_new - done, max(n_cur, 1))
            if on_device:
                vecs = jax.lax.dynamic_slice_in_dim(
                    data, done, self.round_size, axis=0
                )
            else:
                host = np.zeros((self.round_size, cfg.dim), np.float32)
                host[:count] = data[done : done + count]
                vecs = jnp.asarray(host)
            lvls = np.zeros((self.round_size,), np.int32)
            lvls[: min(count, n_new - done)] = levels[done : done + count]
            # static per-round connect ceiling, bucketed to {2, 3, l_max} so
            # the build compiles few insert_round variants (P(level>=3)
            # = M^-3 per point: most rounds top out at 2)
            top_actual = min(int(lvls[:count].max()), self.host_max_level)
            round_top = top_actual
            for b in (2, 3, self.l_max):
                if round_top <= b:
                    round_top = b
                    break
            # descent is only needed as entry for connect layers >= 2 (seeds
            # cover layers 0-1) or while the seed bank is still empty
            need_descent = top_actual >= 2 or self.host_upper_count == 0
            # packed upper-level widths must fit this round's actual counts
            for lv_ in range(1, round_top + 1):
                c_l = int((lvls[:count] >= lv_).sum())
                w_l = upper_round_width(self.round_size, cfg.M, lv_)
                if c_l > w_l:
                    raise RuntimeError(
                        f"round has {c_l} points at level>={lv_}, packed "
                        f"width {w_l} — astronomically unlikely at default "
                        f"mL; raise upper_round_width's margin if hit"
                    )
            self.graph, self.seed_bank, self.seed_n = insert_round(
                self.graph,
                vecs,
                jnp.asarray(lvls),
                jnp.int32(n_cur),
                jnp.int32(count),
                self.seed_bank,
                self.seed_n,
                efc=cfg.ef_construction,
                m=cfg.M,
                m_max0=cfg.M_max0,
                rev_cap=self.rev_cap,
                metric=cfg.metric,
                keep_pruned=cfg.keep_pruned_connections,
                storage=cfg.storage,
                round_top=round_top,
                need_descent=need_descent,
                build_mi=self.build_mi,
                build_ck=self.build_ck,
                extend=cfg.extend_candidates,
                heuristic=cfg.select == "heuristic",
                select_scan=self.select_scan,
            )
            self.host_max_level = max(self.host_max_level,
                                      int(lvls[:count].max()))
            self.host_upper_count += int((lvls[:count] >= 1).sum())
            done += count


def build(data: np.ndarray, config: HnswConfig,
          max_elements: int | None = None, round_size: int = 1024,
          ) -> GraphTensors:
    """Build a full index over `data` with batched parallel insertion."""
    data = np.asarray(data, dtype=np.float32)
    state = BuildState(config, max_elements or data.shape[0],
                       round_size=round_size)
    state.add(data)
    return state.graph
