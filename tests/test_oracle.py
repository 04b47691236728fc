"""Oracle HNSW tests — the reference's test strategy (SURVEY.md §4): unit tests
of structural invariants + recall-vs-brute-force integration tests + determinism."""

import numpy as np
import pytest

from ocaml_hnsw_tpu.config import HnswConfig
from ocaml_hnsw_tpu.oracle import OracleHNSW, bruteforce_knn, recall
from ocaml_hnsw_tpu.bench.datasets import clustered, queries_like


def build_oracle(data, metric="l2", M=16, efc=100, seed=100):
    o = OracleHNSW(HnswConfig(dim=data.shape[1], metric=metric, M=M,
                              ef_construction=efc, seed=seed))
    o.add_items(data)
    return o


class TestStructure:
    def test_invariants_after_build(self):
        data = clustered(500, 16, n_clusters=10, seed=0)
        o = build_oracle(data, M=8, efc=50)
        o.check_invariants()
        assert o.element_count == 500
        assert o.max_level == max(o.levels)
        assert o.levels[o.entry] == o.max_level

    def test_new_edges_bidirectional_before_shrink(self):
        # with generous caps nothing is shrunk, so every edge must be symmetric
        data = clustered(200, 8, n_clusters=5, seed=1)
        o = build_oracle(data, M=32, efc=64)
        for i, per_level in enumerate(o.adj):
            for lc, nbrs in enumerate(per_level):
                for e in nbrs:
                    if len(o.adj[e][lc]) < (o.M_max0 if lc == 0 else o.M_max):
                        assert i in o.adj[e][lc], (i, e, lc)

    def test_level_distribution(self):
        # level = floor(-ln(U) * 1/ln(M)): P(level >= 1) = 1/M
        data = np.random.RandomState(3).rand(4000, 4).astype(np.float32)
        o = build_oracle(data, M=16, efc=10)
        frac_upper = np.mean(np.array(o.levels) >= 1)
        assert 0.03 < frac_upper < 0.10  # expect ~1/16 = 0.0625

    def test_determinism(self):
        data = clustered(300, 12, n_clusters=8, seed=2)
        a = build_oracle(data, M=8, efc=40, seed=42)
        b = build_oracle(data, M=8, efc=40, seed=42)
        assert a.levels == b.levels
        assert a.adj == b.adj
        c = build_oracle(data, M=8, efc=40, seed=43)
        assert a.levels != c.levels


class TestSelectHeuristic:
    def test_diversity_pruning(self):
        # Alg 4: a candidate closer to an already-selected point than to q is dropped.
        # q at origin; c0 = (1, 0); c1 = (1.1, 0) is nearer c0 than q -> pruned;
        # c2 = (0, 2) is diverse -> admitted even though farther.
        cfg = HnswConfig(dim=2, M=2, ef_construction=10)
        o = OracleHNSW(cfg)
        for v in [(1.0, 0.0), (1.1, 0.0), (0.0, 2.0)]:
            o.vectors.append(np.array(v, dtype=np.float32))
            o.adj.append([[]])
            o.levels.append(0)
        q = np.zeros(2, dtype=np.float32)
        cands = [(o._dist(q, o.vectors[i]), i) for i in range(3)]
        sel = [e for _, e in o._select_heuristic(q, cands, 2, 0)]
        assert sel == [0, 2]

    def test_keep_pruned_backfills(self):
        cfg = HnswConfig(dim=2, M=2, ef_construction=10,
                         keep_pruned_connections=True)
        o = OracleHNSW(cfg)
        for v in [(1.0, 0.0), (1.05, 0.0), (1.1, 0.0)]:
            o.vectors.append(np.array(v, dtype=np.float32))
            o.adj.append([[]])
            o.levels.append(0)
        q = np.zeros(2, dtype=np.float32)
        cands = [(o._dist(q, o.vectors[i]), i) for i in range(3)]
        sel = [e for _, e in o._select_heuristic(q, cands, 2, 0)]
        assert sel == [0, 1]  # 1 and 2 both pruned; nearest pruned backfills


class TestRecall:
    @pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
    def test_recall_beats_threshold(self, metric):
        data = clustered(2000, 32, n_clusters=40, seed=5)
        if metric == "ip":
            data = data / np.linalg.norm(data, axis=1, keepdims=True)
        q = queries_like(data, 100, seed=6)
        if metric == "ip":
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
        o = build_oracle(data, metric=metric, M=16, efc=100)
        ids, _ = o.knn_query(q, k=10, ef=64)
        gt, _ = bruteforce_knn(data, q, 10, metric)
        r = recall(ids, gt)
        assert r >= 0.9, f"{metric}: recall {r}"

    def test_higher_ef_higher_recall(self):
        data = clustered(2000, 32, n_clusters=40, seed=8)
        q = queries_like(data, 100, seed=9)
        o = build_oracle(data, M=8, efc=60)
        gt, _ = bruteforce_knn(data, q, 10, "l2")
        r_low = recall(o.knn_query(q, k=10, ef=10)[0], gt)
        r_high = recall(o.knn_query(q, k=10, ef=128)[0], gt)
        assert r_high >= r_low
        assert r_high >= 0.95

    def test_exact_on_tiny(self):
        data = np.random.RandomState(0).randn(50, 8).astype(np.float32)
        o = build_oracle(data, M=16, efc=64)
        q = data[:5]
        ids, dists = o.knn_query(q, k=1, ef=50)
        assert (ids[:, 0] == np.arange(5)).all()
        np.testing.assert_allclose(dists[:, 0], 0.0, atol=1e-5)

    def test_returned_dists_match_metric(self):
        data = clustered(500, 16, n_clusters=10, seed=11)
        q = queries_like(data, 20, seed=12)
        o = build_oracle(data)
        ids, dists = o.knn_query(q, k=5, ef=64)
        for qi in range(20):
            for j in range(5):
                d = data[ids[qi, j]] - q[qi]
                np.testing.assert_allclose(dists[qi, j], np.dot(d, d), rtol=1e-4)


class TestDeletion:
    def test_mark_deleted_excludes_from_results(self):
        data = clustered(300, 16, n_clusters=6, seed=13)
        o = build_oracle(data)
        q = data[7:8]
        ids, _ = o.knn_query(q, k=1, ef=50)
        assert ids[0, 0] == 7
        o.mark_deleted(7)
        ids, _ = o.knn_query(q, k=1, ef=50)
        assert ids[0, 0] != 7
        o.unmark_deleted(7)
        ids, _ = o.knn_query(q, k=1, ef=50)
        assert ids[0, 0] == 7


class TestBruteforce:
    def test_bruteforce_l2_matches_naive(self):
        rng = np.random.RandomState(1)
        data = rng.randn(100, 8).astype(np.float32)
        q = rng.randn(10, 8).astype(np.float32)
        ids, dists = bruteforce_knn(data, q, 3, "l2")
        for qi in range(10):
            full = np.sum((data - q[qi]) ** 2, axis=1)
            expect = np.argsort(full)[:3]
            assert set(ids[qi].tolist()) == set(expect.tolist())

    def test_recall_metric(self):
        a = np.array([[1, 2, 3], [4, 5, 6]])
        b = np.array([[1, 2, 9], [4, 5, 6]])
        assert recall(a, b) == pytest.approx(5 / 6)
