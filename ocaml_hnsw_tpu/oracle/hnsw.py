"""Pure-NumPy sequential HNSW — the behavioral oracle.

This is a faithful, single-threaded implementation of the HNSW paper's
Algorithms 1–5 (Malkov & Yashunin, arXiv:1603.09320), which is exactly what the
upstream reference ``lehy/ocaml-hnsw`` implements (SURVEY.md §0, §3: the
reference mount was empty, so the paper's algorithms are the behavioral spec,
and this oracle is the in-repo stand-in and forever-after parity oracle for the
batched TPU engine — SURVEY.md §4 "Oracle parity tests").

Control flow mirrors SURVEY.md §3's call stacks:
  - ``add``            = Alg 1 INSERT (greedy descent, beam connect, shrink)
  - ``_search_layer``  = Alg 2 SEARCH-LAYER (the hot loop)
  - ``_select_simple`` = Alg 3 SELECT-NEIGHBORS-SIMPLE
  - ``_select_heuristic`` = Alg 4 SELECT-NEIGHBORS-HEURISTIC (both flags)
  - ``knn_query``      = Alg 5 K-NN-SEARCH
"""

from __future__ import annotations

import heapq

import numpy as np

from ocaml_hnsw_tpu.config import HnswConfig


class OracleHNSW:
    """Sequential HNSW over NumPy vectors.  Deterministic given ``config.seed``
    and insertion order (level sampling is the only randomness; SURVEY.md §4)."""

    def __init__(self, config: HnswConfig):
        self.config = config
        self.dim = config.dim
        self.metric = config.metric
        self.M = config.M
        self.M_max = config.M
        self.M_max0 = config.M_max0
        self.ef_construction = config.ef_construction
        self.ef = config.ef
        self.mL = config.mL
        self.rng = np.random.RandomState(config.seed)
        self.vectors: list[np.ndarray] = []
        self.labels: list[int] = []
        self.levels: list[int] = []
        # adj[i][lc] = python list of neighbor internal ids at layer lc
        self.adj: list[list[list[int]]] = []
        self.deleted: set[int] = set()
        self.entry = -1
        self.max_level = -1

    # ------------------------------------------------------------------ dist
    def _prep(self, vec: np.ndarray, query: bool = False) -> np.ndarray:
        from ocaml_hnsw_tpu.ops.metrics import get_metric

        m = get_metric(self.metric)
        vec = np.asarray(vec, dtype=np.float32)
        if m.normalize_query if query else m.normalize_add:
            n = float(np.linalg.norm(vec))
            if n > 0:
                vec = vec / n
        return vec

    def _dist(self, a: np.ndarray, b: np.ndarray) -> float:
        # fast scalar paths for the built-ins (the oracle makes millions of
        # these calls); registry metrics go through their NumPy pair form
        if self.metric == "l2":
            d = a - b
            return float(np.dot(d, d))
        if self.metric in ("ip", "cosine"):
            # cosine vectors pre-normalized at add/query time
            return float(1.0 - np.dot(a, b))
        from ocaml_hnsw_tpu.ops.metrics import get_metric

        return float(get_metric(self.metric).pair_dist_np(b[None, :], a)[0])

    # ----------------------------------------------------------------- Alg 2
    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int, lc: int):
        """Beam search inside one layer; returns [(dist, id)] sorted ascending.

        SURVEY.md §3.3: per-iteration work = 1 heap pop, up to M_max0 adjacency
        reads, up to M_max0 distance evals, up to M_max0 heap pushes.
        """
        visited = set(eps)
        cand = [(self._dist(q, self.vectors[e]), e) for e in eps]
        heapq.heapify(cand)  # nearest-first min-heap C
        result = [(-d, e) for d, e in cand]
        heapq.heapify(result)  # furthest-first max-heap W (negated)
        while cand:
            d_c, c = heapq.heappop(cand)
            if d_c > -result[0][0]:
                break  # beam termination: nearest candidate further than worst result
            for e in self.adj[c][lc]:
                if e in visited:
                    continue
                visited.add(e)
                d_e = self._dist(q, self.vectors[e])
                if d_e < -result[0][0] or len(result) < ef:
                    heapq.heappush(cand, (d_e, e))
                    heapq.heappush(result, (-d_e, e))
                    if len(result) > ef:
                        heapq.heappop(result)
        return sorted((-nd, e) for nd, e in result)

    # ----------------------------------------------------------------- Alg 3
    def _select_simple(self, candidates, M):
        return sorted(candidates)[:M]

    def _select(self, q_vec, candidates, M, lc):
        """Dispatch on config.select: Alg 4 heuristic (default) or Alg 3."""
        if self.config.select == "simple":
            return self._select_simple(candidates, M)
        return self._select_heuristic(q_vec, candidates, M, lc)

    # ----------------------------------------------------------------- Alg 4
    def _select_heuristic(self, q_vec: np.ndarray, candidates, M: int, lc: int):
        """Diversity pruning: admit e only if d(e, q) < d(e, r) for every
        already-selected r.  Optional extendCandidates / keepPrunedConnections
        per the paper; defaults match hnswlib (both effectively off except the
        core admit loop).  Returns [(dist_to_q, id)] in admit order."""
        if self.config.extend_candidates:
            have = {e for _, e in candidates}
            extra = []
            for _, e in list(candidates):
                for e2 in self.adj[e][lc] if lc < len(self.adj[e]) else []:
                    if e2 not in have:
                        have.add(e2)
                        extra.append((self._dist(q_vec, self.vectors[e2]), e2))
            candidates = list(candidates) + extra
        work = sorted(candidates)
        selected: list[tuple[float, int]] = []
        discarded: list[tuple[float, int]] = []
        for d_e, e in work:
            if len(selected) >= M:
                break
            ve = self.vectors[e]
            if all(d_e < self._dist(ve, self.vectors[r]) for _, r in selected):
                selected.append((d_e, e))
            else:
                discarded.append((d_e, e))
        if self.config.keep_pruned_connections:
            for d_e, e in discarded:
                if len(selected) >= M:
                    break
                selected.append((d_e, e))
        return selected

    # ----------------------------------------------------------------- Alg 1
    def add(self, vec: np.ndarray, label: int | None = None) -> int:
        vec = self._prep(vec)
        idx = len(self.vectors)
        self.vectors.append(vec)
        self.labels.append(idx if label is None else int(label))
        # level = floor(-ln(U(0,1)) * mL); use 1-U to avoid log(0)
        lvl = int(-np.log(1.0 - self.rng.uniform()) * self.mL)
        self.levels.append(lvl)
        self.adj.append([[] for _ in range(lvl + 1)])
        if self.entry < 0:
            self.entry, self.max_level = idx, lvl
            return idx
        ep = [self.entry]
        for lc in range(self.max_level, lvl, -1):  # greedy descent, beam 1
            ep = [self._search_layer(vec, ep, 1, lc)[0][1]]
        for lc in range(min(self.max_level, lvl), -1, -1):  # connect phase
            W = self._search_layer(vec, ep, self.ef_construction, lc)
            neighbors = self._select(vec, W, self.M, lc)
            self.adj[idx][lc] = [e for _, e in neighbors]
            m_max = self.M_max0 if lc == 0 else self.M_max
            for _, e in neighbors:
                self.adj[e][lc].append(idx)
                if len(self.adj[e][lc]) > m_max:  # shrink over-full adjacency
                    ve = self.vectors[e]
                    cands = [
                        (self._dist(ve, self.vectors[x]), x) for x in self.adj[e][lc]
                    ]
                    self.adj[e][lc] = [
                        x for _, x in self._select(ve, cands, m_max, lc)
                    ]
            ep = [e for _, e in W]
        if lvl > self.max_level:
            self.entry, self.max_level = idx, lvl
        return idx

    def add_items(self, data: np.ndarray, labels=None) -> None:
        data = np.asarray(data, dtype=np.float32)
        for i, row in enumerate(data):
            self.add(row, None if labels is None else labels[i])

    # ----------------------------------------------------------------- Alg 5
    def knn_query(self, queries: np.ndarray, k: int = 10, ef: int | None = None):
        """Returns (ids[Q, k], dists[Q, k]).  ef defaults to config.ef; the
        layer-0 beam uses max(ef, k) (Alg 5 / hnswlib convention)."""
        queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        ef = max(self.ef if ef is None else ef, k)
        out_ids = np.full((queries.shape[0], k), -1, dtype=np.int64)
        out_d = np.full((queries.shape[0], k), np.inf, dtype=np.float32)
        for qi, q in enumerate(queries):
            q = self._prep(q, query=True)
            ep = [self.entry]
            for lc in range(self.max_level, 0, -1):
                ep = [self._search_layer(q, ep, 1, lc)[0][1]]
            W = self._search_layer(q, ep, ef, 0)
            W = [(d, e) for d, e in W if e not in self.deleted][:k]
            for j, (d, e) in enumerate(W):
                out_ids[qi, j] = self.labels[e]
                out_d[qi, j] = d
        return out_ids, out_d

    # ------------------------------------------------------------- tombstones
    def mark_deleted(self, label: int) -> None:
        try:
            self.deleted.add(self.labels.index(int(label)))
        except ValueError:
            raise KeyError(f"label {label} not in index") from None

    def unmark_deleted(self, label: int) -> None:
        self.deleted.discard(self.labels.index(int(label)))

    # ------------------------------------------------------------- inspection
    @property
    def element_count(self) -> int:
        return len(self.vectors)

    def check_invariants(self) -> None:
        """Graph invariants from SURVEY.md §4: degree caps per layer, neighbor
        level sanity, no self-loops, no duplicate neighbors."""
        for i, per_level in enumerate(self.adj):
            assert len(per_level) == self.levels[i] + 1
            for lc, nbrs in enumerate(per_level):
                cap = self.M_max0 if lc == 0 else self.M_max
                assert len(nbrs) <= cap, (i, lc, len(nbrs), cap)
                assert len(set(nbrs)) == len(nbrs), (i, lc, "dup neighbor")
                assert i not in nbrs, (i, lc, "self loop")
                for e in nbrs:
                    assert self.levels[e] >= lc, (i, lc, e, "neighbor below layer")
