#!/usr/bin/env python3
"""Per-stage profile of the packed query engine at the headline operating
point (VERDICT round-2 task 1: "publish a per-stage time breakdown of one
8192-batch at 1M").

Times, on real hardware:
  1. the full knn_search_packed call (the headline number),
  2. each stage standalone at identical shapes: seed-scan entry, the packed
     beam loop, and the final exact rerank,
  3. inside one beam iteration: payload gather, bf16 score, in-beam dedup,
     bitonic merge — via single-iteration jits at the loop's exact shapes,
  4. knob sweeps: expand x max_iters (equal-gather alternatives) and seed_e.

Usage: python scripts/profile_query.py [--n 1000000] [--batch 8192]
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


def timeit(name, fn, reps=10):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"[qstage] {name:<40s} {dt*1e3:8.2f} ms", flush=True)
    return out, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--ef", type=int, default=96)
    ap.add_argument("--mi", type=int, default=15)
    ap.add_argument("--build-mi", type=int, default=0,
                    help="build-beam cap (0 = none)")
    ap.add_argument("--load", default=None,
                    help="load a saved index npz (skips build)")
    args = ap.parse_args()

    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models.build import BuildState
    from ocaml_hnsw_tpu.models.search import (
        build_seed_index, seed_entries, preprocess_queries,
    )
    from ocaml_hnsw_tpu.models.packed import (
        pack_graph, knn_search_packed, beam_search_layer_packed,
        quantize_queries,
    )
    from ocaml_hnsw_tpu.ops.distance import query_norms, INF, dists_to_ids
    from ocaml_hnsw_tpu.ops.bitset import first_occurrence_mask
    from ocaml_hnsw_tpu.ops.sortmerge import merge_into_beam
    from ocaml_hnsw_tpu.bench import datasets
    from ocaml_hnsw_tpu.bench.harness import (
        build_flat, device_ground_truth,
    )
    from ocaml_hnsw_tpu.oracle.bruteforce import recall as recall_of

    n, dim, b, ef, mi = args.n, args.dim, args.batch, args.ef, args.mi
    k = 10
    cfg = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)

    print(f"[qstage] dataset n={n} dim={dim} batch={b} ef={ef} mi={mi}",
          flush=True)
    data, make_q = datasets.clustered_device(
        n, dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(1000, qseed=8)
    flat = build_flat(data, "l2")
    gt = device_ground_truth(flat, queries, k, "l2")
    del flat

    t0 = time.perf_counter()
    if args.load:
        from ocaml_hnsw_tpu.io import load_index_file

        graph, _, _, _, _, _ = load_index_file(args.load)
        sync(graph.n)
        print(f"[qstage] loaded in {time.perf_counter()-t0:.1f}s", flush=True)
    else:
        state = BuildState(cfg, n, round_size=2048)
        if args.build_mi:
            state.build_mi = args.build_mi
        state.add(data)
        sync(state.graph.n)
        print(f"[qstage] built in {time.perf_counter()-t0:.1f}s", flush=True)
        graph = state.graph
    del data
    seeds = build_seed_index(graph, "l2")
    packed = pack_graph(graph, "l2")
    sync(packed.scale)

    qb = jnp.tile(queries, (b // queries.shape[0] + 1, 1))[:b]

    # ---- 1. the full call
    def full(e=4, s_e=8, m=mi, e_f=ef):
        return knn_search_packed(graph, packed, qb, k=k, ef=e_f, metric="l2",
                                 max_iters=m, expand=e, seeds=seeds,
                                 seed_e=s_e, rerank_k=48)[0]
    out, t_full = timeit(f"knn_search_packed (ef={ef} mi={mi} e=4)", full)
    print(f"[qstage]   => {b/t_full:.0f} QPS", flush=True)

    # recall at this point (1000 unique queries)
    ids, _ = knn_search_packed(graph, packed, queries, k=k, ef=ef,
                               metric="l2", max_iters=mi, seeds=seeds,
                               seed_e=8, rerank_k=48)
    print(f"[qstage]   recall@10 = {recall_of(np.asarray(ids), gt):.4f}",
          flush=True)

    # ---- 2. stages standalone
    q = preprocess_queries(qb, "l2")
    qn = query_norms(q, "l2")

    # NOTE: every stage fn takes the big arrays as ARGUMENTS — a jit closure
    # over device constants ships them inside the (remote) compile request
    # (observed: HTTP 413 from the axon remote-compile endpoint).
    seed_fn = jax.jit(
        lambda graph, seeds, q, qn: seed_entries(graph, seeds, q, qn, 8,
                                                 "l2"))
    (e_ids, e_d), t_seed = timeit("seed_entries (E=8)",
                                  lambda: seed_fn(graph, seeds, q, qn),
                                  reps=10)

    q8 = quantize_queries(q, packed.scale)
    d_pad = packed.d_pad
    if d_pad > q8.shape[1]:
        q8 = jnp.pad(q8, ((0, 0), (0, d_pad - q8.shape[1])))

    beam_fn = jax.jit(
        lambda packed, q8, qn, ei, ed, m=mi, e=4: beam_search_layer_packed(
            packed, q8, qn, ei, ed, ef, needs_norms=True, max_iters=m,
            expand=e)[0],
        static_argnames=("m", "e"),
    )
    beam_ids, t_beam = timeit(f"packed beam loop (mi={mi})",
                              lambda: beam_fn(packed, q8, qn, e_ids, e_d))
    per_it = (t_beam) / mi
    print(f"[qstage]   => {per_it*1e3:.2f} ms/iter", flush=True)

    rer_fn = jax.jit(lambda v, s, nn, ids, q, qn: dists_to_ids(
        v, s, nn, q, qn, ids[:, :48], "l2"))
    _, t_rer = timeit("exact rerank (48)",
                      lambda: rer_fn(graph.vectors, graph.scales,
                                     graph.norms, beam_ids, q, qn))

    print(f"[qstage] accounted: seed {t_seed*1e3:.1f} + beam {t_beam*1e3:.1f}"
          f" + rerank {t_rer*1e3:.1f} = {(t_seed+t_beam+t_rer)*1e3:.1f} of "
          f"{t_full*1e3:.1f} ms", flush=True)

    # ---- 3. one-iteration internals at exact shapes
    deg, c, w = packed.deg, packed.chunks, packed.pay.shape[1]
    expand = 4
    nodes = jnp.abs(beam_ids[:, :expand]) % n  # plausible random-ish ids
    safe = jnp.maximum(nodes, 0)
    beam_d0 = jnp.sort(jax.random.normal(jax.random.PRNGKey(0), (b, ef)))
    beam_i0 = jax.random.randint(jax.random.PRNGKey(1), (b, ef), 0, n)

    gather_fn = jax.jit(lambda meta, pay, safe: (
        meta[safe],
        pay[(safe[:, :, None] * c
             + jnp.arange(c, dtype=jnp.int32)[None, None, :]
             ).reshape(b, -1)],
    ))
    (mrow, praw), t_g = timeit(
        "iter: meta+payload gather",
        lambda: gather_fn(packed.meta, packed.pay, safe))

    q16 = q8.astype(jnp.bfloat16)
    vec8 = praw.reshape(b, expand, deg, d_pad)

    score_fn = jax.jit(lambda s2, qn, vec8, q16, mrow: (
        s2 * (
            mrow[:, :, deg:].astype(jnp.float32)
            - 2.0 * jnp.sum(vec8.astype(jnp.bfloat16) * q16[:, None, None, :],
                            axis=-1, dtype=jnp.float32))
        + qn[:, None, None]))
    s2 = packed.scale * packed.scale
    d_blk, t_s = timeit("iter: bf16 score",
                        lambda: score_fn(s2, qn, vec8, q16, mrow))

    cand_ids = mrow[:, :, :deg].reshape(b, -1)
    cand_d = d_blk.reshape(b, -1)

    dedup_fn = jax.jit(lambda cand_ids, beam_i0: (
        jnp.any(cand_ids[:, :, None] == beam_i0[:, None, :], axis=2),
        first_occurrence_mask(cand_ids)))
    _, t_dd = timeit("iter: in-beam dedup + first-occurrence",
                     lambda: dedup_fn(cand_ids, beam_i0))

    merge_fn = jax.jit(lambda beam_d0, beam_i0, cand_d, cand_ids:
                       merge_into_beam(
                           beam_d0, [(beam_i0, -1), (beam_i0 < 0, True)],
                           cand_d, [(cand_ids, -1), (cand_ids < 0, True)],
                           ef))
    _, t_m = timeit("iter: bitonic merge into beam",
                    lambda: merge_fn(beam_d0, beam_i0, cand_d, cand_ids))

    acc = t_g + t_s + t_dd + t_m
    print(f"[qstage] iter accounted {acc*1e3:.2f} ms vs measured "
          f"{per_it*1e3:.2f} ms/iter", flush=True)

    # ---- 3b. true marginal per-iteration cost: slope of the beam loop over
    # mi (isolated single-stage jits miss loop-carried state costs; the
    # intercept is the loop's fixed overhead)
    for m_lo, m_hi in ((8, 24),):
        _, t_lo = timeit(f"beam loop mi={m_lo}",
                         lambda: beam_fn(packed, q8, qn, e_ids, e_d, m=m_lo))
        _, t_hi = timeit(f"beam loop mi={m_hi}",
                         lambda: beam_fn(packed, q8, qn, e_ids, e_d, m=m_hi))
        slope = (t_hi - t_lo) / (m_hi - m_lo)
        print(f"[qstage] marginal per-iter {slope*1e3:.2f} ms; loop fixed "
              f"{(t_lo - slope*m_lo)*1e3:.1f} ms", flush=True)

    # selection-only probe at loop shapes: pop-E-nearest-unexpanded (cumsum,
    # one-hot, argmax, take_along_axis) — the per-iter stage the round-3
    # profile never isolated
    def select_stage(beam_pk, beam_d):
        unexp = (beam_pk & 1) == 0
        slot = jnp.cumsum(unexp.astype(jnp.int32), axis=1)
        sel_mask = unexp & (slot <= expand)
        beam_pk = jnp.where(sel_mask, beam_pk | 1, beam_pk)
        oh = sel_mask[:, None, :] & (
            slot[:, None, :] == jnp.arange(1, expand + 1)[None, :, None]
        )
        pos = jnp.argmax(oh, axis=2)
        active = jnp.any(oh, axis=2)
        nodes = jnp.where(
            active, jnp.take_along_axis(beam_pk, pos, axis=1) >> 1, -1)
        return beam_pk, nodes

    sel_fn = jax.jit(select_stage)
    beam_pk0 = jnp.where(beam_i0 < 0, -1, beam_i0 * 2)
    timeit("iter: select E unexpanded", lambda: sel_fn(beam_pk0, beam_d0))

    # ---- 4. knob sweeps
    for e, m in ((4, mi), (8, (mi + 1) // 2), (8, mi - 5), (2, 2 * mi),
                 (6, mi - 5)):
        o, t = timeit(f"full e={e} mi={m}", lambda e=e, m=m: full(e=e, m=m))
        ids, _ = knn_search_packed(graph, packed, queries, k=k, ef=ef,
                                   metric="l2", max_iters=m, expand=e,
                                   seeds=seeds, seed_e=8, rerank_k=48)
        print(f"[qstage]   e={e} mi={m}: {b/t:.0f} QPS "
              f"recall={recall_of(np.asarray(ids), gt):.4f}", flush=True)
    for s_e in (8, 16):
        o, t = timeit(f"full seed_e={s_e}", lambda s_e=s_e: full(s_e=s_e))
        ids, _ = knn_search_packed(graph, packed, queries, k=k, ef=ef,
                                   metric="l2", max_iters=mi, seeds=seeds,
                                   seed_e=s_e, rerank_k=48)
        print(f"[qstage]   seed_e={s_e}: {b/t:.0f} QPS "
              f"recall={recall_of(np.asarray(ids), gt):.4f}", flush=True)


if __name__ == "__main__":
    main()
