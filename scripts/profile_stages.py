#!/usr/bin/env python3
"""Stage-by-stage profile of the packed 1M insert round (round-3 build
campaign, VERDICT task 2).

profile_build2.py measured ~1.8 ms/beam-iteration and a ~200 ms per-round
cost OUTSIDE the level-0 beam that nobody has broken down.  This script
isolates every level-0 stage of insert_round at the 1M snapshot and times it
as its own jitted call (isolated timings lose cross-stage fusion, so treat
them as a ranking, not an exact decomposition — the full-round number is the
ground truth).

Usage: python scripts/profile_stages.py [--n 1000000] [--mi 48]
"""

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def sync(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
            return
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def timeit(name, fn, reps=5):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"[stage] {name:<46s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--round-size", type=int, default=2048)
    ap.add_argument("--mi", type=int, default=48)
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.build import (
        BuildState, insert_round, sample_levels, select_neighbors,
        apply_edges,
    )
    from ocaml_hnsw_tpu.models.packed import (
        PackedGraph, beam_search_layer_packed, quantize_queries,
        refresh_payload_rows,
    )
    from ocaml_hnsw_tpu.ops.distance import dists_to_ids, query_norms
    from ocaml_hnsw_tpu.ops.metrics import get_metric
    from ocaml_hnsw_tpu.ops.sortmerge import bitonic_sort, next_pow2
    from ocaml_hnsw_tpu.bench import datasets

    n, dim, rs = args.n, args.dim, args.round_size
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)
    efc, m, m_max0, rev_cap = (cfg.ef_construction, cfg.M, cfg.M_max0, 8)

    print(f"[stage] dataset n={n} dim={dim} rs={rs} mi={args.mi}", flush=True)
    data, _ = datasets.clustered_device(n, dim, n_clusters=max(64, n // 2500),
                                        seed=7)
    t0 = time.perf_counter()
    state = BuildState(cfg, n + rs, round_size=rs)
    state.add(data)
    sync(state.graph.n)
    print(f"[stage] build total {time.perf_counter()-t0:.1f}s", flush=True)

    graph = state.graph
    kw = state._round_kwargs()
    mi = args.mi

    rng = np.random.RandomState(99)
    q = jnp.asarray(np.random.RandomState(3).randn(rs, dim).astype(np.float32))
    lv = jnp.asarray(sample_levels(rng, rs, cfg.mL, state.l_max))

    # ---------- ground truth: the full round
    def full_round(**over):
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

    _, t_full = timeit(f"FULL packed round mi={mi}", full_round(build_mi=mi))
    _, t_lv0 = timeit(f"FULL round mi={mi}, all level 0",
                      full_round(build_mi=mi))


    # ---------- stage inputs (computed once, on device).  Every jitted stage
    # takes its big arrays as ARGUMENTS — closing over them bakes them into
    # the HLO as constants and the remote-compile request 413s.
    metric = cfg.metric
    vectors, scales, norms = graph.vectors, graph.scales, graph.norms
    qn = query_norms(q, metric)
    pk = PackedGraph(pay=state.pack_pay, meta=state.pack_meta,
                     scale=state.pack_scale)

    @jax.jit
    def seed_scan(q, qn, seed_bank, seed_n, seed_vecs, seed_norms,
                  vectors, scales, norms):
        u_cap = seed_bank.shape[0]
        safe_bank = jnp.maximum(seed_bank, 0)
        dot = jax.lax.dot_general(
            q.astype(jnp.bfloat16), seed_vecs,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        scores = get_metric(metric).matmul_score(dot, seed_norms[None])
        live = jnp.arange(u_cap) < seed_n
        scores = jnp.where(live[None, :], scores, jnp.inf)
        _, ii = jax.lax.approx_min_k(scores, 16)
        s_ids = jnp.where(live[ii], safe_bank[ii], -1)
        s_d = dists_to_ids(vectors, scales, norms, q, qn, s_ids, metric)
        return s_ids, s_d

    (s_ids, s_d), _ = timeit(
        "seed scan (entries)",
        lambda: seed_scan(q, qn, state.seed_bank, state.seed_n,
                          state.seed_vecs, state.seed_norms,
                          vectors, scales, norms))

    # level-0 beam, packed
    e0 = 32  # efc_upper width used by insert_round for entries
    pad_i = jnp.full((rs, e0 - 16), -1, jnp.int32)
    pad_d = jnp.full((rs, e0 - 16), jnp.inf)
    entry_ids = jnp.concatenate([s_ids, pad_i], axis=1)
    entry_d = jnp.concatenate([s_d, pad_d], axis=1)

    q8 = quantize_queries(q, state.pack_scale)
    if pk.d_pad > q8.shape[1]:
        q8 = jnp.pad(q8, ((0, 0), (0, pk.d_pad - q8.shape[1])))

    beam_j = jax.jit(partial(
        beam_search_layer_packed, needs_norms=True, max_iters=mi, expand=4,
    ), static_argnames=("ef",))

    (w_ids_q, w_d_q, _), t_beam = timeit(
        f"level-0 packed beam mi={mi}",
        lambda: beam_j(pk, q8, qn, entry_ids, entry_d, ef=efc))

    @jax.jit
    def rescore(w_ids, vectors, scales, norms, q, qn):
        w_d = dists_to_ids(vectors, scales, norms, q, qn, w_ids, metric)
        p2 = next_pow2(efc)
        wd = jnp.pad(w_d, ((0, 0), (0, p2 - efc)), constant_values=jnp.inf)
        wi = jnp.pad(w_ids, ((0, 0), (0, p2 - efc)), constant_values=-1)
        wd, (wi,) = bitonic_sort(wd, [wi], ascending=True)
        return wi[:, :efc], wd[:, :efc]

    (w_ids, w_d), _ = timeit(
        "exact re-score + sort W [R,200]",
        lambda: rescore(w_ids_q, vectors, scales, norms, q, qn))

    sel_j = jax.jit(partial(
        select_neighbors, m=m, metric=metric,
        keep_pruned=cfg.keep_pruned_connections, heuristic=True,
    ))
    (sel_ids, sel_d), _ = timeit(
        "select_neighbors (Alg4, K=200)",
        lambda: sel_j(vectors, scales, norms, w_ids, w_d))

    p_ids = (graph.n + jnp.arange(rs, dtype=jnp.int32)).astype(jnp.int32)
    valid = jnp.ones((rs,), bool)
    apply_j = jax.jit(partial(
        apply_edges, m_cap=m_max0, rev_cap=rev_cap, metric=metric,
        keep_pruned=cfg.keep_pruned_connections, heuristic=True,
    ))
    adj0_new, _ = timeit(
        "apply_edges level 0 (gather dists)",
        lambda: apply_j(graph.adj0, vectors, scales, norms, p_ids, sel_ids,
                        sel_d, valid))
    if state.pack_dist is not None:
        timeit(
            "apply_edges level 0 (stored dists)",
            lambda: apply_j(graph.adj0, vectors, scales, norms, p_ids,
                            sel_ids, sel_d, valid,
                            pack_dist=state.pack_dist))

    @jax.jit
    def run_refresh(pay, meta, scale, adj0, vectors, scales, p_ids, sel_ids):
        pk2 = PackedGraph(pay=pay, meta=meta, scale=scale)
        sink = adj0.shape[0] - 1
        rev_rows = jnp.where(sel_ids >= 0, sel_ids, sink).reshape(-1)
        pk3 = refresh_payload_rows(
            pk2, vectors, scales, adj0, jnp.concatenate([p_ids, rev_rows]))
        return pk3.pay

    timeit("refresh_payload_rows (R + R*M rows)",
           lambda: run_refresh(pk.pay, pk.meta, pk.scale, adj0_new,
                               vectors, scales, p_ids, sel_ids))

    # ---- apply_edges sub-stages
    from ocaml_hnsw_tpu.ops.distance import gather_dequant
    from ocaml_hnsw_tpu.models.build import (
        heuristic_admit, compact_by_mask, pairwise_dists,
    )

    adj0 = graph.adj0
    n_rows = adj0.shape[0]
    sink = n_rows - 1
    pair_valid = sel_ids >= 0
    e_rows = jnp.where(pair_valid, jnp.maximum(sel_ids, 0), sink)

    @jax.jit
    def rev_scatter(e_rows, p_ids):
        tri = jnp.arange(rs)[None, :] < jnp.arange(rs)[:, None]

        def rev_col(j, carry):
            cnt, rev = carry
            e_row = jax.lax.dynamic_slice_in_dim(e_rows, j, 1, axis=1)[:, 0]
            live = e_row != sink
            base = cnt[e_row]
            same = (e_row[None, :] == e_row[:, None]) & live[:, None]
            dup_rank = jnp.sum(same & tri, axis=1)
            pos = base + dup_rank
            keep = live & (pos < rev_cap)
            rev = rev.at[
                jnp.where(keep, e_row, sink), jnp.where(keep, pos, 0)
            ].max(jnp.where(keep, p_ids, -1))
            cnt = cnt.at[e_row].add(live.astype(jnp.int32))
            return cnt, rev

        return jax.lax.fori_loop(
            0, m, rev_col,
            (jnp.zeros((n_rows,), jnp.int32),
             jnp.full((n_rows, rev_cap), -1, jnp.int32)))

    (cnt, rev), _ = timeit("  apply: rev_col scatter loop (16 cols)",
                           lambda: rev_scatter(e_rows, p_ids))

    aff = e_rows.reshape(-1)
    aff_ids = jnp.where(sel_ids >= 0, sel_ids, 0).reshape(-1)

    @jax.jit
    def combined_dists(rev, adj0, aff, aff_ids, vectors, scales, norms):
        old = adj0[aff]
        new_ps = rev[aff]
        combined = jnp.concatenate([old, new_ps], axis=1)
        cvalid = combined >= 0
        evec = gather_dequant(vectors, scales, aff_ids[:, None])[:, 0, :]
        enorm = norms[aff_ids]
        dcomb = dists_to_ids(vectors, scales, norms, evec, enorm,
                             jnp.where(cvalid, combined, -1), metric)
        return combined, cvalid, dcomb

    (combined, cvalid, dcomb), _ = timeit(
        "  apply: gather combined rows + dists [R*M,40]",
        lambda: combined_dists(rev, adj0, aff, aff_ids, vectors, scales,
                               norms))

    @jax.jit
    def shrink(combined, cvalid, dcomb, vectors, scales, norms):
        k2 = combined.shape[1]
        p2 = next_pow2(k2)
        sd_in = jnp.where(cvalid, dcomb, jnp.float32(np.inf))
        si_in = combined
        sd_in = jnp.pad(sd_in, ((0, 0), (0, p2 - k2)),
                        constant_values=jnp.inf)
        si_in = jnp.pad(si_in, ((0, 0), (0, p2 - k2)), constant_values=-1)
        sc_d, (sc_ids,) = bitonic_sort(sd_in, [si_in], ascending=True)
        sc_d, sc_ids = sc_d[:, :k2], sc_ids[:, :k2]
        sc_valid = sc_ids >= 0
        svec = gather_dequant(vectors, scales, sc_ids)
        snorm = norms[jnp.maximum(sc_ids, 0)]
        pair2 = pairwise_dists(svec, snorm, metric,
                               precision=jax.lax.Precision.DEFAULT)
        sel2 = heuristic_admit(sc_d, pair2, sc_valid, m_max0,
                               cfg.keep_pruned_connections)
        out, _ = compact_by_mask(sc_ids, sc_d, sel2, m_max0)
        return out

    timeit("  apply: shrink (sort+gather+pair+admit)",
           lambda: shrink(combined, cvalid, dcomb, vectors, scales, norms))

    # ---- select_neighbors sub-stages
    @jax.jit
    def sel_gather_pair(vectors, scales, norms, w_ids):
        cvec = gather_dequant(vectors, scales, w_ids)
        cnorm = norms[jnp.maximum(w_ids, 0)]
        return pairwise_dists(cvec, cnorm, metric)

    pair, _ = timeit(
        "  select: gather 200 + pairwise [R,200,200]",
        lambda: sel_gather_pair(vectors, scales, norms, w_ids))

    @jax.jit
    def sel_admit(pair, w_ids, w_d):
        sel = heuristic_admit(w_d, pair, w_ids >= 0, m,
                              cfg.keep_pruned_connections)
        return compact_by_mask(w_ids, w_d, sel, m)

    timeit("  select: admit loop + compact",
           lambda: sel_admit(pair, w_ids, w_d))

    print("[stage] done", flush=True)


if __name__ == "__main__":
    main()
