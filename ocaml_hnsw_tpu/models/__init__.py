from ocaml_hnsw_tpu.models.graph import GraphTensors, from_oracle, empty_graph
from ocaml_hnsw_tpu.models.search import (
    knn_search,
    SeedIndex,
    build_seed_index,
)

__all__ = [
    "GraphTensors",
    "from_oracle",
    "empty_graph",
    "knn_search",
    "SeedIndex",
    "build_seed_index",
]
