#!/usr/bin/env python3
"""Headline benchmark: QPS/chip at recall@10 >= 0.95 on a SIFT1M-shaped
synthetic dataset (no real datasets on this machine — BASELINE.md), printed as
ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline is measured against the driver target of 100,000 QPS/chip
(BASELINE.json north_star; the reference publishes no absolute numbers).

Other configs: python bench.py --config {random10k,sift100k,sift1m,glove1m}
"""

import argparse
import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# name: (n, dim, metric, round_size, efc, engines, hnsw_storage, scan_dtype,
#        rerank_dtype) — engines/dtypes sized to one v5e chip's 16GB HBM
CONFIGS = {
    "random10k": (10_000, 128, "l2", 512, 64,
                  ("hnsw", "flat"), "f32", "bf16", "f32"),  # BASELINE cfg 1
    "sift100k": (100_000, 128, "l2", 1024, 200,
                 ("hnsw", "flat"), "f32", "bf16", "f32"),
    "sift1m": (1_000_000, 128, "l2", 2048, 200,
               ("hnsw", "flat"), "f32", "bf16", "f32"),     # BASELINE cfg 2
    "glove1m": (1_183_514, 100, "cosine", 2048, 200,
                ("hnsw", "flat"), "f32", "bf16", "f32"),    # BASELINE cfg 3
    # config 4: int8-quantized distances; HNSW adjacency at 10M exceeds one
    # chip alongside the flat engine — flat (int8 scan + bf16 rerank) only
    "deep10m": (10_000_000, 96, "l2", 2048, 200,
                ("flat",), "int8", "int8", "bf16"),
    # config 5 stand-in at 1M rows (full 5M x 768 build exceeds a bench run)
    "laion1m": (1_000_000, 768, "cosine", 2048, 200,
                ("flat",), "bf16", "int8", "bf16"),
}

# config 5 measured AS streaming (interleaved timed inserts + query batches)
STREAMING = {"laion-streaming": (1_000_000, 768, "cosine")}

TARGET_QPS = 100_000.0  # BASELINE.json north_star


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sift1m",
                    choices=sorted(CONFIGS) + sorted(STREAMING))
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--qps-batch", type=int, default=8192)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    # (persistent compile cache deliberately NOT enabled: AOT executable
    # reload crashed on this machine — cpu_aot_loader feature mismatch on
    # CPU, and the axon tunnel had a libtpu AOT version-mismatch failure
    # mode in round 1; cold compiles are slower but safe)
    from ocaml_hnsw_tpu.bench.harness import run_config, run_streaming_config

    if args.config in STREAMING:
        n, dim, metric = STREAMING[args.config]
        result = run_streaming_config(
            args.config, n=n, dim=dim, metric=metric,
            n_queries=args.queries, qps_batch=args.qps_batch,
            verbose=not args.quiet,
        )
        line = {
            "metric": f"sustained QPS during ingest ({args.config})",
            "value": result["sustained_qps_during_ingest"],
            "unit": "qps",
            "vs_baseline": round(
                (result["sustained_qps_during_ingest"] or 0) / TARGET_QPS, 4
            ),
            "ingest_vps": result["ingest_vps"],
            "recall": result["recall"],
            "backend": result["backend"],
        }
        print(json.dumps(line))
        return

    (n, dim, metric, round_size, efc, engines, storage, scan_dtype,
     rerank_dtype) = CONFIGS[args.config]
    result = run_config(
        args.config,
        n=n,
        dim=dim,
        metric=metric,
        n_queries=args.queries,
        round_size=round_size,
        ef_construction=efc,
        qps_batch=args.qps_batch,
        engines=engines,
        storage=storage,
        scan_dtype=scan_dtype,
        rerank_dtype=rerank_dtype,
        verbose=not args.quiet,
    )
    hnsw = result["engines"].get("hnsw", {})
    line = {
        "metric": f"QPS/chip at recall@10>={result['target_recall']} "
                  f"({args.config} synthetic)",
        "value": result["qps"],
        "unit": "qps",
        "vs_baseline": round(result["qps"] / TARGET_QPS, 4),
        "engine": result["engine"],
        "recall": result["recall"],
        "hnsw_qps": hnsw.get("best", {}).get("qps"),
        "hnsw_recall": hnsw.get("best", {}).get("recall"),
        "hnsw_build_vectors_per_second": hnsw.get("build_vectors_per_second"),
        "backend": result["backend"],
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
