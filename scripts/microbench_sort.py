#!/usr/bin/env python3
"""Micro-benchmarks of the selection/merge primitives the round-3 edits
touched, old form vs new form, at the headline shapes (B=8192, 1M graph):

  1. merge_into_beam: 2 payloads (ids, exp) vs 1 packed payload
  2. entry setup: lax.top_k over ef-padded entries vs entries_to_beam
  3. rerank selection: lax.top_k vs topk_ascending at [B, 96] -> 32
  4. seed scan: approx_min_k on f32 scores vs bf16 scores ([B, 65536])

CAVEAT (measured): through the axon tunnel each jitted CALL pays a ~5-6 ms
RPC dispatch floor, so single-op timings here are floor-dominated — treat
them as A/B comparisons at equal call counts only; absolute per-op cost must
come from a full-program timing (scripts/profile_query.py's full call).

Usage: python scripts/microbench_sort.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from ocaml_hnsw_tpu.ops.sortmerge import (  # noqa: E402
    entries_to_beam, merge_into_beam, topk_ascending,
)


def timeit(name, fn, reps=20):
    out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / reps
    print(f"[micro] {name:<52s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    b, ef, c = 8192, 96, 128
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    beam_d = jnp.sort(jax.random.normal(k1, (b, ef)), axis=1)
    beam_ids = jax.random.randint(k2, (b, ef), 0, 1 << 20)
    beam_exp = jax.random.bernoulli(k3, 0.5, (b, ef))
    cand_d = jax.random.normal(k4, (b, c))
    cand_ids = jax.random.randint(k1, (b, c), 0, 1 << 20)

    # 1. merge: two payloads (old) vs packed single payload (new)
    m_old = jax.jit(lambda bd, bi, be, cd, ci: merge_into_beam(
        bd, [(bi, -1), (be, True)], cd, [(ci, -1), (ci < 0, True)], ef))
    m_new = jax.jit(lambda bd, pk, cd, cpk: merge_into_beam(
        bd, [(pk, -1)], cd, [(cpk, -1)], ef))
    beam_pk = beam_ids * 2 + beam_exp.astype(jnp.int32)
    cand_pk = cand_ids * 2
    timeit("merge_into_beam 2 payloads (old)",
           lambda: m_old(beam_d, beam_ids, beam_exp, cand_d, cand_ids))
    timeit("merge_into_beam 1 packed payload (new)",
           lambda: m_new(beam_d, beam_pk, cand_d, cand_pk))

    # 2. entry setup at e0=8 -> ef=96
    e_ids = jax.random.randint(k2, (b, 8), 0, 1 << 20)
    e_d = jax.random.normal(k3, (b, 8))

    def entry_old(e_ids, e_d):
        pad = ef - 8
        all_d = jnp.pad(e_d, ((0, 0), (0, pad)), constant_values=jnp.inf)
        all_ids = jnp.pad(e_ids, ((0, 0), (0, pad)), constant_values=-1)
        neg, idx = jax.lax.top_k(-all_d, ef)
        return jnp.take_along_axis(all_ids, idx, axis=1), -neg

    entry_old_j = jax.jit(entry_old)
    entry_new_j = jax.jit(lambda i, d: entries_to_beam(i, d, ef))
    timeit("entry setup: lax.top_k over padded (old)",
           lambda: entry_old_j(e_ids, e_d))
    timeit("entry setup: entries_to_beam (new)",
           lambda: entry_new_j(e_ids, e_d))

    # 3. rerank selection [B, 96] -> 32
    def rk_old(d, ids):
        neg, idx = jax.lax.top_k(-d, 32)
        return jnp.take_along_axis(ids, idx, axis=1), -neg

    rk_old_j = jax.jit(rk_old)
    rk_new_j = jax.jit(lambda d, i: topk_ascending(d, i, 32))
    timeit("rerank select: lax.top_k [8192,96]->32 (old)",
           lambda: rk_old_j(beam_d, beam_ids))
    timeit("rerank select: topk_ascending (new)",
           lambda: rk_new_j(beam_d, beam_ids))

    # 4. seed scan: matmul + approx_min_k, f32 vs bf16 scores
    u = 65536
    dim = 128
    q = jax.random.normal(k1, (b, dim), jnp.bfloat16)
    bank = jax.random.normal(k2, (u, dim), jnp.bfloat16)
    nrm = jax.random.uniform(k3, (u,), jnp.float32)

    def seed(q, bank, nrm, dt):
        dot = jax.lax.dot_general(q, bank, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        scores = nrm[None, :] - 2.0 * dot
        return jax.lax.approx_min_k(scores.astype(dt), 8)[1]

    seed_f32_j = jax.jit(lambda q, b2, n: seed(q, b2, n, jnp.float32))
    seed_b16_j = jax.jit(lambda q, b2, n: seed(q, b2, n, jnp.bfloat16))
    timeit("seed scan [8192,65536]: approx_min_k f32 (old)",
           lambda: seed_f32_j(q, bank, nrm))
    timeit("seed scan [8192,65536]: approx_min_k bf16 (new)",
           lambda: seed_b16_j(q, bank, nrm))

    # 5. in-beam dedup at candidate widths 128 and 64
    dedup_j = jax.jit(lambda ci, bi: jnp.any(
        ci[:, :, None] == bi[:, None, :], axis=2))
    for cw in (128, 64):
        ci = jnp.asarray(cand_ids[:, :cw])
        timeit(f"in-beam dedup [8192,{cw},96]",
               lambda ci=ci: dedup_j(ci, beam_ids))


if __name__ == "__main__":
    main()
