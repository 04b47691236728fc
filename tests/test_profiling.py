"""Observability tests: search cost counters (SURVEY.md §5.5)."""

import numpy as np

from ocaml_hnsw_tpu.config import HnswConfig
from ocaml_hnsw_tpu.oracle import OracleHNSW
from ocaml_hnsw_tpu.models import from_oracle
from ocaml_hnsw_tpu.utils.profiling import search_stats, Timer, sync
from ocaml_hnsw_tpu.bench.datasets import clustered, queries_like


def test_search_stats_counts():
    data = clustered(800, 16, n_clusters=16, seed=0)
    o = OracleHNSW(HnswConfig(dim=16, M=8, ef_construction=50))
    o.add_items(data)
    g = from_oracle(o)
    q = queries_like(data, 32, seed=1)
    st = search_stats(g, q, k=10, ef=32, metric="l2")
    assert st["beam_iterations"] > 0
    assert st["expansions_per_query"] == st["beam_iterations"] * st["expand"]
    assert st["distance_evals"] == (
        32 * st["beam_iterations"] * st["expand"] * g.adj0.shape[1]
    )
    assert st["gathered_bytes"] == st["distance_evals"] * 16 * 4
    # more ef => at least as many iterations
    st2 = search_stats(g, q, k=10, ef=128, metric="l2")
    assert st2["beam_iterations"] >= st["beam_iterations"]


def test_timer_and_sync():
    import jax.numpy as jnp

    with Timer("t") as t:
        x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
        sync(x)
    assert t.seconds > 0
