from ocaml_hnsw_tpu.oracle.hnsw import OracleHNSW
from ocaml_hnsw_tpu.oracle.bruteforce import bruteforce_knn, recall

__all__ = ["OracleHNSW", "bruteforce_knn", "recall"]
