"""Bench harness smoke test (tiny, CPU): the driver runs bench.py on hardware
every round — this guards the plumbing (both engines, JSON fields)."""

from ocaml_hnsw_tpu.bench.harness import run_config


def test_run_config_tiny():
    r = run_config(
        "tiny",
        n=2048,
        dim=16,
        metric="l2",
        n_queries=64,
        M=8,
        ef_construction=40,
        round_size=256,
        ef_sweep=(16, 48),
        rerank_sweep=(32,),
        qps_batch=64,
        verbose=False,
    )
    assert r["qps"] > 0
    assert 0 <= r["recall"] <= 1
    assert r["engine"] in ("hnsw", "flat")
    assert set(r["engines"]) == {"hnsw", "flat"}
    h = r["engines"]["hnsw"]
    assert h["build_vectors_per_second"] > 0
    assert h["sweep"][0]["ef"] == 16
    f = r["engines"]["flat"]
    assert f["best"]["recall"] >= 0.9


def test_flat_only_int8():
    r = run_config(
        "tiny8",
        n=4096,
        dim=32,
        metric="l2",
        n_queries=64,
        engines=("flat",),
        scan_dtype="int8",
        rerank_dtype="bf16",
        rerank_sweep=(32,),
        qps_batch=64,
        verbose=False,
    )
    assert r["engine"] == "flat"
    assert r["recall"] >= 0.9
