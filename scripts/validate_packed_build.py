#!/usr/bin/env python3
"""Fast on-device validation of the packed-build payload invariants after
apply_edges/payload-by-product changes (round 3).  Mirrors the CPU tests in
tests/test_packed.py::TestPackedBuildDist but runs on the TPU where a small
build is seconds, not minutes (this host has ONE CPU core).

Checks:
  1. dist-sync invariant: after a multi-round packed build, the maintained
     PackedGraph.dist equals a fresh pack_graph(with_dist=True) bit-for-bit
     (f32 storage).
  2. meta/pay sync: maintained meta ids == adj0; maintained payload rows ==
     fresh pack rows for every live node (valid slots only).
  3. stored-dist apply == gather-dist apply (adj0/meta equality).
  4. end-to-end recall of a packed 50k build vs brute force.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from ocaml_hnsw_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()


def main():
    from ocaml_hnsw_tpu.config import HnswConfig
    from ocaml_hnsw_tpu.models import build as B
    from ocaml_hnsw_tpu.models.packed import pack_graph
    from ocaml_hnsw_tpu.models.search import build_seed_index
    from ocaml_hnsw_tpu.models.packed import knn_search_packed, PackedGraph

    B.BuildState.PACKED_BUILD_THRESHOLD = 1  # force packed at small N

    rng = np.random.RandomState(0)
    data = rng.randn(3000, 32).astype(np.float32)
    cfg = HnswConfig(dim=32, metric="l2", M=8, ef_construction=48)
    st = B.BuildState(cfg, 3500, round_size=256)
    st.add(data[:2500])

    # 1. dist sync
    fresh = pack_graph(st.graph, "l2", with_dist=True)
    a = np.asarray(st.pack_dist)
    b = np.asarray(fresh.dist)
    n = int(st.graph.n)
    same = (a[:n] == b[:n]) | (np.isinf(a[:n]) & np.isinf(b[:n]))
    print(f"[val] dist sync: {same.mean():.6f} equal "
          f"({'OK' if same.all() else 'FAIL'})", flush=True)

    # 2. meta/pay sync on valid slots
    adj = np.asarray(st.graph.adj0)[:n]
    meta = np.asarray(st.pack_meta)[:n]
    deg = adj.shape[1]
    ids_ok = (meta[:, :deg] == adj).all()
    print(f"[val] meta ids == adj0: {'OK' if ids_ok else 'FAIL'}", flush=True)
    pay = np.asarray(st.pack_pay)
    fpay = np.asarray(fresh.pay)
    c = pay.shape[0] // st.graph.n_cap
    d_pad = (pay.shape[1] * c) // deg
    mine = pay[: n * c].reshape(n, deg, d_pad)
    ref = fpay[: n * c].reshape(n, deg, d_pad)
    valid = adj >= 0
    pay_ok = (mine[valid] == ref[valid]).all()
    nrm_ok = (meta[:, deg:][valid] == np.asarray(fresh.meta)[:n, deg:][valid]
              ).all()
    print(f"[val] payload rows (valid slots): {'OK' if pay_ok else 'FAIL'}; "
          f"norms: {'OK' if nrm_ok else 'FAIL'}", flush=True)

    # 3. stored vs gather apply equality
    q = jnp.asarray(data[2500:2756])
    lv = jnp.asarray(B.sample_levels(
        np.random.RandomState(5), 256, cfg.mL, st.l_max))
    kw = st._round_kwargs()
    args = (st.graph, q, lv, st.graph.n, jnp.int32(256), st.seed_bank,
            st.seed_n, st.seed_vecs, st.seed_norms, st.pack_pay,
            st.pack_meta, st.pack_scale)
    out_a = B.insert_round(*args, st.pack_dist, **kw)
    out_b = B.insert_round(*args, None, **kw)
    eq_adj = np.array_equal(np.asarray(out_a[0].adj0),
                            np.asarray(out_b[0].adj0))
    eq_meta = np.array_equal(np.asarray(out_a[6]), np.asarray(out_b[6]))
    print(f"[val] stored==gather apply: adj {'OK' if eq_adj else 'FAIL'}, "
          f"meta {'OK' if eq_meta else 'FAIL'}, dist carried: "
          f"{out_a[7] is not None and out_b[7] is None}", flush=True)

    # 4. end recall at 50k
    from ocaml_hnsw_tpu.bench import datasets
    from ocaml_hnsw_tpu.bench.harness import build_flat, device_ground_truth
    from ocaml_hnsw_tpu.oracle.bruteforce import recall as recall_of

    n2, dim = 50_000, 64
    data2, make_q = datasets.clustered_device(n2, dim, n_clusters=64, seed=3)
    cfg2 = HnswConfig(dim=dim, metric="l2", M=16, ef_construction=200)
    t0 = time.perf_counter()
    st2 = B.BuildState(cfg2, n2, round_size=1024)
    st2.add(data2)
    np.asarray(st2.graph.n)
    print(f"[val] 50k build {time.perf_counter()-t0:.1f}s", flush=True)
    queries = make_q(1000, qseed=11)
    flat = build_flat(data2, "l2", scan_dtype="bf16", rerank_dtype="f32")
    gt = device_ground_truth(flat, queries, 10, "l2")
    seeds = build_seed_index(st2.graph, "l2")
    pk = PackedGraph(pay=st2.pack_pay, meta=st2.pack_meta,
                     scale=st2.pack_scale)
    ids, _ = knn_search_packed(
        st2.graph, pk, jnp.asarray(queries), k=10, ef=96, metric="l2",
        max_iters=15, expand=4, seeds=seeds)
    r = recall_of(np.asarray(ids), gt)
    print(f"[val] 50k packed recall@10 (ef=96 mi=15): {r:.4f} "
          f"({'OK' if r >= 0.93 else 'LOW'})", flush=True)


if __name__ == "__main__":
    main()
