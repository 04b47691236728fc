"""Pallas kernel tests (interpret mode on CPU; compiled on TPU).

The int8 scan kernel was deleted after losing its race against the XLA
int8 path on hardware — see ocaml_hnsw_tpu/ops/pallas/__init__.py for the
measurements.  What remains is the fused gather+distance kernel kept as the
measurement harness for the transaction-bound-gather claim."""

import numpy as np
import jax
import jax.numpy as jnp

from ocaml_hnsw_tpu.ops.pallas import gather_l2

INTERP = jax.devices()[0].platform != "tpu"


class TestGatherL2:
    def test_matches_reference(self):
        rng = np.random.RandomState(0)
        n, d, b, k = 512, 128, 16, 32
        vecs = rng.randn(n, d).astype(np.float32)
        ids = rng.randint(0, n, size=(b, k)).astype(np.int32)
        q = rng.randn(b, d).astype(np.float32)
        out = gather_l2(jnp.asarray(vecs), jnp.asarray(ids), jnp.asarray(q),
                        tb=8, interpret=INTERP)
        ref = np.sum((vecs[ids] - q[:, None, :]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)

    def test_single_tile(self):
        rng = np.random.RandomState(1)
        n, d, b, k = 256, 128, 8, 16
        vecs = rng.randn(n, d).astype(np.float32)
        ids = rng.randint(0, n, size=(b, k)).astype(np.int32)
        q = rng.randn(b, d).astype(np.float32)
        out = gather_l2(jnp.asarray(vecs), jnp.asarray(ids), jnp.asarray(q),
                        tb=8, interpret=INTERP)
        assert out.shape == (b, k)
        ref = np.sum((vecs[ids] - q[:, None, :]) ** 2, axis=-1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
