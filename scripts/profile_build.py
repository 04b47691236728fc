#!/usr/bin/env python3
"""Per-stage profile of the 1M HNSW build (VERDICT round-2 task 2).

Measures, on real hardware:
  1. per-round wall time across the whole build (separating compile hits),
  2. a stage breakdown of one warm insert_round at the 1M snapshot
     (seed scan / level-0 beam / selection / apply_edges),
  3. per-vector cost at different round sizes (the amortization lever).

Usage: python scripts/profile_build.py [--n 1000000] [--round-size 2048]
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


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--round-size", type=int, default=2048)
    ap.add_argument("--stages-only", action="store_true")
    ap.add_argument("--round-sweep", default="2048,4096,8192")
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.build import (
        BuildState, insert_round, sample_levels, select_neighbors,
        apply_edges, upper_round_width,
    )
    from ocaml_hnsw_tpu.models.search import beam_search_layer
    from ocaml_hnsw_tpu.ops.distance import dists_to_ids, query_norms, INF
    from ocaml_hnsw_tpu.bench import datasets

    n, dim, rs = args.n, args.dim, args.round_size
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)

    print(f"[profile] dataset n={n} dim={dim}", flush=True)
    data, _ = datasets.clustered_device(n, dim, n_clusters=max(64, n // 2500),
                                        seed=7)

    # ---- 1. per-round timing across the build
    state = BuildState(cfg, n + rs, round_size=rs)

    t_start = time.perf_counter()
    round_times = []
    done = 0
    # drive add() one round at a time so each round is timed
    while done < n:
        step = min(rs, n - done, max(int(state.graph.n), 1))
        t0 = time.perf_counter()
        state.add(jax.lax.dynamic_slice_in_dim(data, done, step, axis=0)
                  if step == rs else data[done:done + step])
        sync(state.graph.n)
        dt = time.perf_counter() - t0
        round_times.append((done, step, dt))
        done += step
    total = time.perf_counter() - t_start
    print(f"[profile] build total {total:.1f}s = {n/total:.0f} vps", flush=True)

    # compile hits: rounds that took >5x the median
    med = np.median([t for _, _, t in round_times])
    hits = [(d, s, t) for d, s, t in round_times if t > 5 * med and s > 32]
    print(f"[profile] median round ({rs} pts): {med*1e3:.1f} ms "
          f"({med/rs*1e6:.1f} us/vec)")
    print(f"[profile] compile-hit rounds (>5x median): "
          f"{[(d, round(t, 1)) for d, s, t in hits]}")
    comp_est = sum(t - med for _, _, t in hits)
    print(f"[profile] est. compile seconds inside build: {comp_est:.1f}")

    # late-build steady state: mean of last 50 rounds
    tail = [t for _, s, t in round_times[-50:] if s == rs]
    print(f"[profile] steady-state round: {np.mean(tail)*1e3:.1f} ms "
          f"= {rs/np.mean(tail):.0f} vps", flush=True)

    graph = state.graph
    seed_bank, seed_n = state.seed_bank, state.seed_n

    # ---- 2. stage breakdown at the 1M snapshot
    q = jax.random.normal(jax.random.PRNGKey(0), (rs, dim), jnp.float32)
    qn = query_norms(q, "l2")
    lvls = jnp.zeros((rs,), jnp.int32)

    def timeit(name, fn, reps=5):
        out = fn()
        sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"[stage] {name:<28s} {dt*1e3:8.2f} ms", flush=True)
        return out, dt

    # full warm round (no graph growth: reinsert at the same snapshot)
    def full_round():
        g2, *_ = insert_round(
            graph, q, lvls, graph.n, jnp.int32(rs), seed_bank, seed_n,
            efc=cfg.ef_construction, m=cfg.M, m_max0=cfg.M_max0,
            rev_cap=state.rev_cap, metric="l2", keep_pruned=True,
            storage="f32",
            build_mi=state.build_mi, build_ck=state.build_ck,
            extend=False, heuristic=True, select_scan=state.select_scan,
        )
        return g2.n
    _, t_full = timeit("insert_round (full, warm)", full_round)

    # NOTE: every stage fn takes the big arrays as ARGUMENTS — a jit closure
    # over device constants ships them in the (remote) compile request
    # (observed: HTTP 413 from the axon remote-compile endpoint).
    from ocaml_hnsw_tpu.ops.distance import gather_dequant

    @jax.jit
    def seed_scan(vectors, scales, norms, bank, bank_n, q, qn):
        safe_bank = jnp.maximum(bank, 0)
        bank_vecs = gather_dequant(vectors, scales, safe_bank[None, :])[0]
        dot = jax.lax.dot_general(
            q.astype(jnp.bfloat16), bank_vecs.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        bank_norms = jnp.sum(bank_vecs * bank_vecs, axis=1)
        scores = dot * -2.0 + bank_norms[None, :]
        live = jnp.arange(bank.shape[0]) < bank_n
        scores = jnp.where(live[None, :], scores, jnp.inf)
        _, ii = jax.lax.approx_min_k(scores, 16)
        s_ids = jnp.where(live[ii], safe_bank[ii], -1)
        s_d = dists_to_ids(vectors, scales, norms, q, qn, s_ids, "l2")
        return s_ids, s_d

    (s_ids, s_d), t_seed = timeit(
        f"seed scan (bank={seed_bank.shape[0]})",
        lambda: seed_scan(graph.vectors, graph.scales, graph.norms,
                          seed_bank, seed_n, q, qn))

    # level-0 beam at efc, sweeping the iteration cap
    pad = cfg.ef_construction - s_ids.shape[1]
    entry_ids = jnp.pad(s_ids, ((0, 0), (0, pad)), constant_values=-1)
    entry_d = jnp.pad(s_d, ((0, 0), (0, pad)), constant_values=jnp.inf)

    beam0 = jax.jit(
        lambda vectors, scales, norms, adj0, q, qn, ei, ed, mi=None:
        beam_search_layer(vectors, scales, norms, adj0, q, qn, ei, ed,
                          cfg.ef_construction, "l2", expand=4,
                          visited_bits=0, max_iters=mi,
                          compact_k=state.build_ck),
        static_argnames=("mi",),
    )
    (w_ids, w_d, iters), t_beam = timeit(
        "level-0 beam (efc=200)",
        lambda: beam0(graph.vectors, graph.scales, graph.norms, graph.adj0,
                      q, qn, entry_ids, entry_d))
    print(f"[stage]   beam iterations to converge: {int(iters)}")
    for mi in (48, 40, 32, 24):
        (_, _, it2), t_mi = timeit(
            f"level-0 beam mi={mi}",
            lambda mi=mi: beam0(graph.vectors, graph.scales, graph.norms,
                                graph.adj0, q, qn, entry_ids, entry_d,
                                mi=mi))

    # selection (Alg 4 heuristic over the efc-wide W set)
    sel_fn = jax.jit(
        lambda vectors, scales, norms, w_ids, w_d, lim=None:
        select_neighbors(vectors, scales, norms, w_ids, w_d, cfg.M, "l2",
                         True, heuristic=True, scan_limit=lim),
        static_argnames=("lim",),
    )
    (sel_ids, sel_d), t_sel = timeit(
        "select_neighbors (Alg 4)",
        lambda: sel_fn(graph.vectors, graph.scales, graph.norms, w_ids, w_d))
    for lim in (96, 64):
        _, _ = timeit(
            f"select_neighbors lim={lim}",
            lambda lim=lim: sel_fn(graph.vectors, graph.scales, graph.norms,
                                   w_ids, w_d, lim=lim))

    # apply_edges at level 0
    p_ids = graph.n + jnp.arange(rs, dtype=jnp.int32)
    valid = jnp.ones((rs,), jnp.bool_)

    apply0 = jax.jit(
        lambda adj0, vectors, scales, norms, p_ids, sel_ids, sel_d, valid:
        apply_edges(adj0, vectors, scales, norms, p_ids, sel_ids, sel_d,
                    valid, cfg.M_max0, state.rev_cap, "l2", True,
                    heuristic=True))
    _, t_apply = timeit(
        "apply_edges (level 0)",
        lambda: apply0(graph.adj0, graph.vectors, graph.scales, graph.norms,
                       p_ids, sel_ids, sel_d, valid))

    acc = t_seed + t_beam + t_sel + t_apply
    print(f"[stage] {'accounted':<28s} {acc*1e3:8.2f} ms "
          f"({acc/t_full*100:.0f}% of full round)")
    print(f"[stage] {'unaccounted (upper+misc)':<28s} "
          f"{(t_full-acc)*1e3:8.2f} ms", flush=True)

    # ---- 3. round-size sweep at the snapshot
    if args.round_sweep:
        for r2 in [int(x) for x in args.round_sweep.split(",") if x]:
            q2 = jax.random.normal(jax.random.PRNGKey(1), (r2, dim))
            lv2 = jnp.zeros((r2,), jnp.int32)

            def big_round():
                g2, *_ = insert_round(
                    graph, q2, lv2, graph.n, jnp.int32(r2), seed_bank, seed_n,
                    efc=cfg.ef_construction, m=cfg.M, m_max0=cfg.M_max0,
                    rev_cap=state.rev_cap, metric="l2", keep_pruned=True,
                    storage="f32",
                    build_mi=state.build_mi,
                    build_ck=state.build_ck,
                    extend=False, heuristic=True,
                    select_scan=state.select_scan,
                )
                return g2.n
            _, t_r = timeit(f"insert_round R={r2}", big_round, reps=3)
            print(f"[sweep]   R={r2}: {t_r/r2*1e6:.1f} us/vec "
                  f"= {r2/t_r:.0f} vps", flush=True)


if __name__ == "__main__":
    main()
