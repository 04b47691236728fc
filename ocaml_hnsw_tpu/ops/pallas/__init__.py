from ocaml_hnsw_tpu.ops.pallas.scan_int8 import int8_scan_blockmin, int8_flat_search

__all__ = ["int8_scan_blockmin", "int8_flat_search"]
