"""Bitonic sort/merge network tests (the beam's heap replacement)."""

import numpy as np
import jax.numpy as jnp

from ocaml_hnsw_tpu.ops.sortmerge import bitonic_sort, bitonic_merge, merge_into_beam


class TestBitonic:
    def test_sort_matches_numpy(self):
        rng = np.random.RandomState(0)
        d = rng.rand(16, 128).astype(np.float32)
        ids = rng.randint(0, 1000, (16, 128)).astype(np.int32)
        sd, (si,) = bitonic_sort(jnp.asarray(d), [jnp.asarray(ids)], ascending=True)
        np.testing.assert_allclose(np.asarray(sd), np.sort(d, axis=1))
        # payload follows its key
        for b in range(16):
            got = dict(zip(np.asarray(sd)[b].tolist(), np.asarray(si)[b].tolist()))
            want = dict(zip(d[b].tolist(), ids[b].tolist()))
            assert got == want

    def test_sort_descending(self):
        rng = np.random.RandomState(1)
        d = rng.rand(4, 64).astype(np.float32)
        sd, _ = bitonic_sort(jnp.asarray(d), [], ascending=False)
        np.testing.assert_allclose(np.asarray(sd), -np.sort(-d, axis=1))

    def test_merge_bitonic_sequence(self):
        rng = np.random.RandomState(2)
        a = np.sort(rng.rand(8, 32), axis=1)
        b = -np.sort(-rng.rand(8, 32), axis=1)
        m = jnp.asarray(np.concatenate([a, b], axis=1).astype(np.float32))
        md, _ = bitonic_merge(m, [])
        np.testing.assert_allclose(
            np.asarray(md), np.sort(np.concatenate([a, b], 1), axis=1), rtol=1e-6
        )

    def test_merge_into_beam_equals_topk(self):
        rng = np.random.RandomState(3)
        for ef, c in [(64, 128), (200, 128), (17, 40), (128, 32)]:
            beam_d = np.sort(rng.rand(8, ef), axis=1).astype(np.float32)
            cand_d = rng.rand(8, c).astype(np.float32)
            beam_i = rng.randint(0, 10**6, (8, ef)).astype(np.int32)
            cand_i = rng.randint(0, 10**6, (8, c)).astype(np.int32)
            md, (mi,) = merge_into_beam(
                jnp.asarray(beam_d), [(jnp.asarray(beam_i), -1)],
                jnp.asarray(cand_d), [(jnp.asarray(cand_i), -1)], ef,
            )
            all_d = np.concatenate([beam_d, cand_d], 1)
            all_i = np.concatenate([beam_i, cand_i], 1)
            order = np.argsort(all_d, axis=1)[:, :ef]
            np.testing.assert_allclose(
                np.asarray(md), np.take_along_axis(all_d, order, 1), rtol=1e-6
            )
            np.testing.assert_array_equal(
                np.asarray(mi), np.take_along_axis(all_i, order, 1)
            )

    def test_merge_with_inf_padding(self):
        beam_d = jnp.asarray([[1.0, jnp.inf, jnp.inf, jnp.inf]])
        beam_i = jnp.asarray([[5, -1, -1, -1]], dtype=jnp.int32)
        cand_d = jnp.asarray([[0.5, jnp.inf, 2.0]])
        cand_i = jnp.asarray([[7, -1, 9]], dtype=jnp.int32)
        md, (mi,) = merge_into_beam(beam_d, [(beam_i, -1)], cand_d,
                                    [(cand_i, -1)], 4)
        assert np.asarray(mi)[0].tolist() == [7, 5, 9, -1]
