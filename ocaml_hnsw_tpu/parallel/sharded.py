"""Multi-chip sharded index — the distributed layer the reference lacks
(SURVEY.md §2 "Distributed communication backend: none", §5.8): dataset and
graph sharded by node id over a `jax.sharding.Mesh`, queries replicated,
collectives over ICI.

Design (SURVEY.md §5.8 "simpler: per-shard full searches + global top-k merge,
which is exact for sharded-by-partition indexes"):

- points are assigned **round-robin** to S shards (global id g ↔ shard g % S,
  local slot g // S), so every shard holds an unbiased sample of the data and
  per-shard recall matches single-shard recall at equal ef;
- each shard is an independent HNSW subindex; one `shard_map` step runs the
  single-chip engine per device — **build** (insert_round) and **query**
  (knn_search) both SPMD over the mesh;
- query merge: per-shard local top-k → `all_gather` over the shard axis (ICI)
  → global top-k.  The merge is exact given the per-shard results, so recall
  composes; the only cross-chip traffic is [S, B, k] ids+dists.

The same stacked-graph pytree runs on one chip (S=1), a CPU-simulated 8-device
mesh (tests), or a real pod slice — only the Mesh changes.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

from ocaml_hnsw_tpu.config import HnswConfig, METRICS
from ocaml_hnsw_tpu.models.graph import GraphTensors, empty_graph
from ocaml_hnsw_tpu.models.search import knn_search
from ocaml_hnsw_tpu.models.build import (
    insert_round,
    bootstrap,
    sample_levels,
)

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), axis_names=(AXIS,))


def _local(tree: GraphTensors) -> GraphTensors:
    """Strip the leading per-shard dim inside shard_map."""
    return jax.tree.map(lambda a: a[0], tree)


def _graph_specs() -> GraphTensors:
    """PartitionSpecs for a stacked graph: every field sharded on dim 0."""
    return GraphTensors(*([P(AXIS)] * len(GraphTensors._fields)))


def sharded_knn(mesh: Mesh, stacked: GraphTensors, queries, k: int, ef: int,
                metric: str, n_shards: int):
    """SPMD query step: local search per shard, all_gather + global top-k.

    queries are replicated; returns replicated (global_ids i32[B, k],
    dists f32[B, k]).  Local ids are mapped to global via g = l * S + s
    (round-robin placement)."""

    def step(local_stacked, q):
        g = _local(local_stacked)
        s = jax.lax.axis_index(AXIS)
        ids, d = knn_search(g, q, k=k, ef=ef, metric=metric)
        gids = jnp.where(ids >= 0, ids * n_shards + s, -1)
        all_ids = jax.lax.all_gather(gids, AXIS)  # [S, B, k] over ICI
        all_d = jax.lax.all_gather(d, AXIS)
        b = q.shape[0]
        flat_ids = jnp.moveaxis(all_ids, 0, 1).reshape(b, -1)
        flat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, -1)
        neg, idx = jax.lax.top_k(-flat_d, k)
        return jnp.take_along_axis(flat_ids, idx, axis=1), -neg

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(_graph_specs(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # engine loop carries are not vma-annotated
    )
    return fn(stacked, queries)


def sharded_insert_round(
    mesh: Mesh,
    stacked: GraphTensors,
    vecs,  # f32[S, R, D] per-shard round payload (already prepped)
    levels,  # i32[S, R]
    start,  # i32[S]
    count,  # i32[S]
    *,
    efc: int,
    m: int,
    m_max0: int,
    rev_cap: int,
    metric: str,
    keep_pruned: bool,
):
    """SPMD build step: every device runs one insert_round on its own shard.
    No cross-shard edges exist (shards are independent subindexes), so the
    only collective is the implicit SPMD program itself."""

    def step(local_stacked, v, lv, st, ct):
        g = _local(local_stacked)
        g2, _, _ = insert_round(
            g, v[0], lv[0], st[0], ct[0],
            efc=efc, m=m, m_max0=m_max0, rev_cap=rev_cap, metric=metric,
            keep_pruned=keep_pruned,
        )
        return jax.tree.map(lambda a: a[None], g2)

    fn = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(_graph_specs(), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=_graph_specs(),
        check_vma=False,  # engine loop carries are not vma-annotated
    )
    return fn(stacked, vecs, levels, start, count)


class ShardedIndex:
    """Dataset-sharded HNSW over a device mesh (phase-2 scale-out path).

    Each shard gets every S-th point (round-robin), its own seeded level
    stream (seed + shard), and builds independently; queries fan out to all
    shards and merge exactly.  On one host this also works with a single
    device (S=1) or the CPU-simulated mesh used in tests."""

    def __init__(self, space: str, dim: int, mesh: Mesh | None = None):
        if space not in METRICS:
            raise ValueError(f"space must be one of {METRICS}, got {space!r}")
        self.space = space
        self.dim = dim
        self.mesh = mesh or make_mesh()
        self.n_shards = self.mesh.devices.size
        self._stacked: GraphTensors | None = None
        self._labels = np.zeros((0,), dtype=np.int64)
        self.ef = 10

    def init_index(self, max_elements: int, M: int = 16,
                   ef_construction: int = 200, random_seed: int = 100,
                   round_size: int = 256, max_level_cap: int | None = None,
                   **_ignored) -> None:
        s = self.n_shards
        per_shard = -(-max_elements // s)  # ceil
        self.config = HnswConfig(
            dim=self.dim, metric=self.space, M=M,
            ef_construction=ef_construction, seed=random_seed,
            max_level_cap=max_level_cap,
        )
        self.max_elements = max_elements
        self.round_size = round_size
        self.per_shard_cap = per_shard
        proto = empty_graph(self.config, per_shard + round_size + 1)
        stacked = jax.tree.map(
            lambda a: jnp.broadcast_to(a[None], (s,) + a.shape), proto
        )
        sharding = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P(AXIS)), stacked
        )
        self._stacked = jax.device_put(stacked, sharding)
        self._rngs = [
            np.random.RandomState(random_seed + i) for i in range(s)
        ]
        self._shard_n = np.zeros(s, dtype=np.int64)  # host mirror of n
        self.rev_cap = 8

    def _require_init(self):
        if self._stacked is None:
            raise RuntimeError("call init_index first")
        return self._stacked

    def add_items(self, data, ids=None) -> None:
        stacked = self._require_init()
        cfg = self.config
        s = self.n_shards
        data = np.atleast_2d(np.asarray(data, dtype=np.float32))
        if cfg.metric == "cosine":
            nrm = np.linalg.norm(data, axis=1, keepdims=True)
            data = data / np.where(nrm == 0, 1.0, nrm)
        n_new = data.shape[0]
        n_tot = int(self._shard_n.sum())
        if n_tot + n_new > self.max_elements:
            raise RuntimeError("index is full; grow max_elements")
        if ids is None:
            labels = np.arange(n_tot, n_tot + n_new, dtype=np.int64)
        else:
            labels = np.asarray(ids, dtype=np.int64).reshape(-1)
            if labels.shape[0] != n_new:
                raise ValueError("ids length must match data rows")
        clash = np.intersect1d(labels, self._labels)
        if clash.size:
            raise ValueError(
                f"duplicate labels not supported: {clash[:5].tolist()}"
            )
        self._labels = np.concatenate([self._labels, labels])

        # round-robin assignment by global insertion order
        gids = np.arange(n_tot, n_tot + n_new)
        shard_of = gids % s
        per_shard_data = [data[shard_of == i] for i in range(s)]
        per_shard_levels = [
            sample_levels(self._rngs[i], len(per_shard_data[i]), cfg.mL,
                          int(stacked.adj_upper.shape[1]))
            for i in range(s)
        ]

        # host bootstrap for shards whose graph is still empty
        boot_needed = [
            i for i in range(s)
            if self._shard_n[i] == 0 and len(per_shard_data[i])
        ]
        if boot_needed:
            host = jax.tree.map(np.asarray, stacked)
            graphs = [
                GraphTensors(*(jnp.asarray(f[i]) for f in host))
                for i in range(s)
            ]
            for i in boot_needed:
                graphs[i] = bootstrap(
                    graphs[i], per_shard_data[i][0],
                    int(per_shard_levels[i][0]), cfg.metric,
                )
                per_shard_data[i] = per_shard_data[i][1:]
                per_shard_levels[i] = per_shard_levels[i][1:]
                self._shard_n[i] += 1
            restacked = jax.tree.map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *graphs
            )
            sharding = jax.tree.map(
                lambda _: NamedSharding(self.mesh, P(AXIS)), restacked
            )
            stacked = jax.device_put(restacked, sharding)

        done = np.zeros(s, dtype=np.int64)
        todo = np.array([len(d) for d in per_shard_data])
        r = self.round_size
        while (done < todo).any():
            vecs = np.zeros((s, r, self.dim), np.float32)
            lvls = np.zeros((s, r), np.int32)
            start = np.zeros((s,), np.int32)
            count = np.zeros((s,), np.int32)
            for i in range(s):
                # doubling schedule per shard
                c = int(min(r, todo[i] - done[i], max(self._shard_n[i], 1)))
                c = max(c, 0)
                count[i] = c
                start[i] = self._shard_n[i]
                if c:
                    vecs[i, :c] = per_shard_data[i][done[i] : done[i] + c]
                    lvls[i, :c] = per_shard_levels[i][done[i] : done[i] + c]
            stacked = sharded_insert_round(
                self.mesh, stacked,
                jnp.asarray(vecs), jnp.asarray(lvls),
                jnp.asarray(start), jnp.asarray(count),
                efc=cfg.ef_construction, m=cfg.M, m_max0=cfg.M_max0,
                rev_cap=self.rev_cap, metric=cfg.metric,
                keep_pruned=cfg.keep_pruned_connections,
            )
            done += count
            self._shard_n += count
        self._stacked = stacked

    def set_ef(self, ef: int) -> None:
        self.ef = int(ef)

    def knn_query(self, data, k: int = 1, ef: int | None = None):
        stacked = self._require_init()
        data = np.atleast_2d(np.asarray(data, dtype=np.float32))
        q_n = data.shape[0]
        b = 8
        while b < q_n:
            b *= 2
        padded = np.zeros((b, self.dim), np.float32)
        padded[:q_n] = data
        gids, d = sharded_knn(
            self.mesh, stacked, jnp.asarray(padded), k=k,
            ef=max(ef if ef is not None else self.ef, k),
            metric=self.space, n_shards=self.n_shards,
        )
        gids = np.asarray(gids)[:q_n]
        d = np.asarray(d)[:q_n]
        labels = np.where(gids >= 0, self._labels[np.maximum(gids, 0)], -1)
        return labels.astype(np.int64), d

    def mark_deleted(self, label: int) -> None:
        stacked = self._require_init()
        gid = int(np.where(self._labels == int(label))[0][0])
        s, l = gid % self.n_shards, gid // self.n_shards
        self._stacked = stacked._replace(
            deleted=stacked.deleted.at[s, l].set(True)
        )

    def get_current_count(self) -> int:
        return int(self._shard_n.sum())
