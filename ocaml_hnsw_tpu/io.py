"""Index checkpointing — save/load of the whole index as one `.npz`
(SURVEY.md §5.4: the canonical surface requires save_index/load_index with
resize-on-load even though the reference's own serialization is minimal).

Everything needed to resume — vectors, per-level adjacency, entry point,
levels, tombstones, params, and the RNG state so incremental insert after
load continues the exact level-sampling stream — goes in the file.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import jax.numpy as jnp

from ocaml_hnsw_tpu.config import HnswConfig
from ocaml_hnsw_tpu.models.graph import GraphTensors

FORMAT_VERSION = 2  # v2: compact upper-arena (adj_up/up_base/up_n); v1 files
# (dense adj_upper) are converted on load


def _arena_from_dense(adj_upper, levels, n, m, max_elements):
    """Convert a v1 dense [l_max, N_cap, M] upper-adjacency stack into the
    compact-arena layout (insertion-order row allocation, like from_oracle)."""
    from ocaml_hnsw_tpu.models.graph import arena_capacity

    l_max = adj_upper.shape[0]
    t_cap = arena_capacity(max_elements, m)
    adj_up = np.full((t_cap, adj_upper.shape[2]), -1, np.int32)
    up_base = np.full((levels.shape[0],), -1, np.int32)
    up_n = 0
    for i in range(n):
        lvl = int(levels[i])
        if lvl >= 1:
            up_base[i] = up_n
            for lc in range(1, lvl + 1):
                adj_up[up_n + lc - 1] = adj_upper[lc - 1, i]
            up_n += lvl
    return adj_up, up_base, up_n, l_max


def save_index_file(path, graph: GraphTensors, config: HnswConfig,
                    labels: np.ndarray, rng_state=None,
                    max_elements: int | None = None, ef: int = 10) -> None:
    meta = {
        "format_version": FORMAT_VERSION,
        "config": dataclasses.asdict(config),
        "max_elements": int(max_elements or graph.n_cap),
        "ef": int(ef),  # query-time ef persists across save/load (hnswlib does too)
    }
    arrays = {
        "vectors": np.asarray(graph.vectors),
        "scales": np.asarray(graph.scales),
        "norms": np.asarray(graph.norms),
        "adj0": np.asarray(graph.adj0),
        "adj_up": np.asarray(graph.adj_up),
        "up_base": np.asarray(graph.up_base),
        "up_n": np.asarray(graph.up_n),
        "l_max": np.asarray(graph.l_max_static),
        "levels": np.asarray(graph.levels),
        "entry": np.asarray(graph.entry),
        "max_level": np.asarray(graph.max_level),
        "n": np.asarray(graph.n),
        "deleted": np.asarray(graph.deleted),
        "labels": np.asarray(labels, dtype=np.int64),
        "meta_json": np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        ),
    }
    if rng_state is not None:
        # RandomState.get_state() = (name, keys[624] u32, pos, has_gauss, gauss)
        name, keys, pos, has_gauss, gauss = rng_state
        arrays["rng_keys"] = keys
        arrays["rng_rest"] = np.array([pos, has_gauss, gauss], dtype=np.float64)
    # np.savez(path, ...) appends ".npz" when the name lacks it, breaking the
    # save("idx.bin") → load("idx.bin") round-trip; an open handle does not.
    with open(path, "wb") as f:
        np.savez(f, **arrays)


def load_index_file(path):
    """Returns (graph, config, labels, rng_state, max_elements, ef)."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode("utf-8"))
        if meta["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"index file format {meta['format_version']} is newer than "
                f"this library supports ({FORMAT_VERSION})"
            )
        config = HnswConfig(**meta["config"])
        if "adj_upper" in z:  # format v1: dense [l_max, N_cap, M] upper layers
            adj_up, up_base, up_n, l_max = _arena_from_dense(
                np.asarray(z["adj_upper"]), np.asarray(z["levels"]),
                int(z["n"]), config.M, meta["max_elements"],
            )
        else:
            adj_up = np.asarray(z["adj_up"])
            up_base = np.asarray(z["up_base"])
            up_n = int(z["up_n"])
            l_max = int(z["l_max"])
        graph = GraphTensors(
            vectors=jnp.asarray(z["vectors"]),
            scales=jnp.asarray(z["scales"]),
            norms=jnp.asarray(z["norms"]),
            adj0=jnp.asarray(z["adj0"]),
            adj_up=jnp.asarray(adj_up),
            up_base=jnp.asarray(up_base),
            up_n=jnp.int32(up_n),
            levels=jnp.asarray(z["levels"]),
            entry=jnp.asarray(z["entry"]),
            max_level=jnp.asarray(z["max_level"]),
            n=jnp.asarray(z["n"]),
            deleted=jnp.asarray(z["deleted"]),
            l_max_static=l_max,
        )
        labels = np.asarray(z["labels"])
        rng_state = None
        if "rng_keys" in z:
            pos, has_gauss, gauss = z["rng_rest"]
            rng_state = (
                "MT19937",
                np.asarray(z["rng_keys"], dtype=np.uint32),
                int(pos),
                int(has_gauss),
                float(gauss),
            )
        return graph, config, labels, rng_state, meta["max_elements"], meta.get("ef", 10)
