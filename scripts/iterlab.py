#!/usr/bin/env python3
"""Slope-based decomposition of the packed beam iteration.

Isolated single-stage jits are useless through the axon tunnel (multi-ms
dispatch floor per call + lost cross-stage fusion), so this lab measures
each stage's cost as a SLOPE: run the real loop with one stage ablated at
mi=8 and mi=24, and read the per-iteration marginal off the difference.
The ablations keep tensor shapes and the loop-carried state identical, so
XLA's scheduling stays representative.

Variants:
  full        the real loop body
  nogather    payload gather replaced by broadcasting one fixed chunk row
              (score/merge shapes unchanged) -> slope drop = payload gather
  nometa      meta gather replaced by iota ids / ones norms
  noscore     bf16 multiply-reduce replaced by a cheap per-candidate copy
  nodedup     in-beam dedup mask replaced by (cand >= 0)
  nomerge     bitonic merge replaced by keeping the old beam and injecting
              the first ef candidates (keeps data dependencies alive)
  nosel       selection replaced by a rotating fixed window of beam slots

Usage: python scripts/iterlab.py --load /tmp/qlab1m.npz
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

from ocaml_hnsw_tpu.ops.distance import INF  # noqa: E402
from ocaml_hnsw_tpu.ops.bitset import first_occurrence_mask  # noqa: E402
from ocaml_hnsw_tpu.ops.sortmerge import (  # noqa: E402
    entries_to_beam, merge_into_beam,
)


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).ravel()[:1]


@partial(jax.jit, static_argnames=("ef", "max_iters", "expand", "variant"))
def loop(pay, meta, scale, q8, qn, entry_ids, entry_d, ef: int,
         max_iters: int, expand: int, variant: str):
    b = q8.shape[0]
    n_cap, two_deg = meta.shape
    deg = two_deg // 2
    w = pay.shape[1]
    c = pay.shape[0] // n_cap
    d_pad = q8.shape[1]
    s2 = scale * scale
    q16 = q8.astype(jnp.bfloat16)

    uniq = first_occurrence_mask(entry_ids) & (entry_ids >= 0)
    entry_ids = jnp.where(uniq, entry_ids, -1)
    entry_d = jnp.where(uniq, entry_d, INF)
    beam_ids, beam_d = entries_to_beam(entry_ids, entry_d, ef)
    beam_pk = jnp.where(beam_ids < 0, -1, beam_ids * 2)

    def body(i, state):
        beam_pk, beam_d = state
        if variant == "nosel":
            start = (i * expand) % (ef - expand)
            pos = start + jnp.arange(expand, dtype=jnp.int32)
            nodes = beam_pk[:, pos] >> 1
            beam_pk = beam_pk  # untouched
        else:
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
                active, jnp.take_along_axis(beam_pk, pos, axis=1) >> 1, -1
            )
        safe = jnp.maximum(nodes, 0)
        if variant == "nometa":
            nbrs = (safe[:, :, None] * 31 + jnp.arange(
                deg, dtype=jnp.int32)) % n_cap
            nrm = jnp.ones((b, expand, deg), jnp.float32)
        else:
            mrow = meta[safe]
            nbrs = jnp.where((nodes >= 0)[:, :, None], mrow[:, :, :deg], -1)
            nrm = mrow[:, :, deg:].astype(jnp.float32)
        if variant == "nogather":
            vec8 = jnp.broadcast_to(
                pay[:c].reshape(1, 1, deg, d_pad),
                (b, expand, deg, d_pad),
            )
        else:
            # 'hotgather': same gather op, indices folded into a 128-row
            # working set — real data dependence (not hoistable like
            # 'nogather'), near-zero HBM randomness; full − hotgather ≈ the
            # true random-fetch cost
            src = safe % 128 if variant == "hotgather" else safe
            cid = (src[:, :, None] * c
                   + jnp.arange(c, dtype=jnp.int32)[None, None, :]
                   ).reshape(b, -1)
            vec8 = pay[cid].reshape(b, expand, deg, d_pad)
        if variant == "noscore":
            dot = vec8[:, :, :, 0].astype(jnp.float32) + nrm * 0.0
        else:
            dot = jnp.sum(
                vec8.astype(jnp.bfloat16) * q16[:, None, None, :],
                axis=-1, dtype=jnp.float32,
            )
        d = s2 * (nrm - 2.0 * dot) + qn[:, None, None]
        cand_ids = nbrs.reshape(b, -1)
        cand_d = d.reshape(b, -1)
        if variant == "nodedup":
            fresh = cand_ids >= 0
        else:
            in_beam = jnp.any(
                cand_ids[:, :, None] == (beam_pk >> 1)[:, None, :], axis=2
            )
            fresh = (cand_ids >= 0) & ~in_beam \
                & first_occurrence_mask(cand_ids)
        cand_pk = jnp.where(fresh, cand_ids * 2, -1)
        cand_d = jnp.where(fresh, cand_d, INF)
        if variant == "nomerge":
            beam_d = beam_d.at[:, ef - expand:].set(
                cand_d[:, :expand] * 0.0 + beam_d[:, ef - expand:])
            beam_pk = beam_pk.at[:, ef - expand:].set(
                jnp.where(cand_pk[:, :expand] >= -1,
                          beam_pk[:, ef - expand:],
                          beam_pk[:, ef - expand:]))
        else:
            beam_d, (beam_pk,) = merge_into_beam(
                beam_d, [(beam_pk, -1)], cand_d, [(cand_pk, -1)], ef,
            )
        return beam_pk, beam_d

    beam_pk, beam_d = jax.lax.fori_loop(0, max_iters, body,
                                        (beam_pk, beam_d))
    return beam_pk >> 1, beam_d


def timeit(fn, reps=8):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", default="/tmp/qlab1m.npz")
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--ef", type=int, default=96)
    ap.add_argument("--expand", type=int, default=4)
    ap.add_argument("--max-chunk", type=int, default=2048)
    args = ap.parse_args()

    from ocaml_hnsw_tpu.io import load_index_file
    from ocaml_hnsw_tpu.models.packed import pack_graph, quantize_queries
    from ocaml_hnsw_tpu.models.search import (
        build_seed_index, seed_entries, preprocess_queries,
    )
    from ocaml_hnsw_tpu.ops.distance import query_norms
    from ocaml_hnsw_tpu.bench import datasets

    graph, cfg, _, _, _, _ = load_index_file(args.load)
    sync(graph.n)
    n = int(graph.n)
    print(f"[iter] loaded n={n}", flush=True)
    packed = pack_graph(graph, "l2", max_chunk=args.max_chunk)
    sync(packed.scale)
    print(f"[iter] payload deg={packed.deg} chunks={packed.chunks}x"
          f"{packed.pay.shape[1]}B", flush=True)
    seeds = build_seed_index(graph, "l2")
    _, make_q = datasets.clustered_device(
        n, cfg.dim, n_clusters=max(64, n // 2500), seed=7)
    queries = make_q(args.batch, qseed=8)

    q = preprocess_queries(jnp.asarray(queries), "l2")
    qn = query_norms(q, "l2")
    e_ids, e_d = jax.jit(
        lambda g, s, q, qn: seed_entries(g, s, q, qn, 8, "l2")
    )(graph, seeds, q, qn)
    q8 = quantize_queries(q, packed.scale)
    d_pad = packed.d_pad
    if d_pad > q8.shape[1]:
        q8 = jnp.pad(q8, ((0, 0), (0, d_pad - q8.shape[1])))

    ef, e = args.ef, args.expand
    base = {}
    for variant in ("full", "hotgather", "nogather", "nometa", "noscore",
                    "nodedup", "nomerge", "nosel"):
        ts = {}
        for mi in (8, 24):
            ts[mi] = timeit(lambda v=variant, m=mi: loop(
                packed.pay, packed.meta, packed.scale, q8, qn, e_ids, e_d,
                ef=ef, max_iters=m, expand=e, variant=v))
        slope = (ts[24] - ts[8]) / 16
        base[variant] = slope
        delta = "" if variant == "full" else (
            f"  stage={1e3*(base['full']-slope):+.2f} ms/iter")
        print(f"[iter] {variant:<9s} slope {slope*1e3:6.2f} ms/iter "
              f"(mi8 {ts[8]*1e3:6.1f} / mi24 {ts[24]*1e3:6.1f}){delta}",
              flush=True)


if __name__ == "__main__":
    main()
