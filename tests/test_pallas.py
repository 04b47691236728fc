"""Pallas int8 scan kernel tests (interpret mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ocaml_hnsw_tpu.ops.pallas import int8_scan_blockmin, int8_flat_search
from ocaml_hnsw_tpu.models.flat import empty_flat, flat_add
from ocaml_hnsw_tpu.oracle import bruteforce_knn, recall
from ocaml_hnsw_tpu.bench.datasets import clustered, queries_like

INTERP = jax.devices()[0].platform != "tpu"


def quant(x):
    amax = np.abs(x).max(axis=1)
    s = np.where(amax > 0, amax / 127.0, 1.0)
    q = np.clip(np.round(x / s[:, None]), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


class TestBlockMin:
    def test_matches_reference(self):
        rng = np.random.RandomState(0)
        b, n, d, g = 256, 2048, 128, 32
        x = rng.randn(n, d).astype(np.float32) * 3
        q = rng.randn(b, d).astype(np.float32) * 3
        xi, xs = quant(x)
        qi, qs = quant(q)
        xd = xi.astype(np.float32) * xs[:, None]
        xn = (xd * xd).sum(1).astype(np.float32)
        bmin, barg = int8_scan_blockmin(
            jnp.asarray(qi), jnp.asarray(qs), jnp.asarray(xi),
            jnp.asarray(xs), jnp.asarray(xn), block_g=g, tb=256, tn=1024,
            metric="l2", interpret=INTERP,
        )
        bmin, barg = np.asarray(bmin).T, np.asarray(barg).T  # -> [B, N/G]
        # reference: scores on dequantized values, shifted by -||q||^2
        qd = qi.astype(np.float32) * qs[:, None]
        scores = xn[None, :] - 2.0 * qd @ xd.T
        ref = scores.reshape(b, n // g, g)
        np.testing.assert_allclose(bmin, ref.min(-1), rtol=1e-4, atol=1e-3)
        # argmin: value-correct (ties may break differently than numpy)
        picked = np.take_along_axis(
            scores, barg.reshape(b, -1), axis=1
        ).reshape(b, n // g)
        np.testing.assert_allclose(picked, ref.min(-1), rtol=1e-4, atol=1e-3)

    def test_ip_mask_bias(self):
        rng = np.random.RandomState(1)
        b, n, d, g = 256, 1024, 128, 32
        x = rng.randn(n, d).astype(np.float32)
        q = rng.randn(b, d).astype(np.float32)
        xi, xs = quant(x)
        qi, qs = quant(q)
        bias = np.zeros(n, np.float32)
        bias[512:] = np.inf  # mask second half
        bmin, barg = int8_scan_blockmin(
            jnp.asarray(qi), jnp.asarray(qs), jnp.asarray(xi),
            jnp.asarray(xs), jnp.asarray(bias), block_g=g, tb=256, tn=1024,
            metric="ip", interpret=INTERP,
        )
        bm = np.asarray(bmin).T
        assert np.isinf(bm[:, 16:]).all()
        assert np.isfinite(bm[:, :16]).all()


class TestInt8FlatSearch:
    def test_recall(self):
        data = clustered(4096, 128, n_clusters=64, seed=2)
        q = queries_like(data, 256, seed=3)
        flat = empty_flat(128, 4096, scan_dtype="int8")
        flat = flat_add(flat, jnp.asarray(data), jnp.int32(0), jnp.int32(4096))
        gt, _ = bruteforce_knn(data, q, 10, "l2")
        ids, dists = int8_flat_search(flat, jnp.asarray(q), k=10, metric="l2",
                                      rerank_k=64, interpret=INTERP)
        r = recall(np.asarray(ids), gt)
        assert r >= 0.9, r
        assert (np.diff(np.asarray(dists), axis=1) >= -1e-6).all()
