from ocaml_hnsw_tpu.ops.distance import dists_to_ids, query_norms, pairwise_dists
from ocaml_hnsw_tpu.ops.bitset import (
    bitset_new,
    bitset_test,
    bitset_set,
    first_occurrence_mask,
)

__all__ = [
    "dists_to_ids",
    "query_norms",
    "pairwise_dists",
    "bitset_new",
    "bitset_test",
    "bitset_set",
    "first_occurrence_mask",
]
