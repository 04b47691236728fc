"""Dense visited-bitset ops — the TPU replacement for the reference's per-query
visited hash set (SURVEY.md §2 "Visited set", §2 native-component item 3):
one packed uint32[B, N_cap/32] tensor, tested with gathers and updated with a
scatter-add that is exact bitwise-OR under the engine's invariants.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bitset_new(batch: int, n_cap: int) -> jax.Array:
    """Fresh all-zeros bitset for `batch` queries over `n_cap` node slots."""
    assert n_cap % 32 == 0, "pad N_cap to a multiple of 32"
    return jnp.zeros((batch, n_cap // 32), dtype=jnp.uint32)


def bitset_test(bits: jax.Array, ids: jax.Array) -> jax.Array:
    """bool[B, K]: whether each id's bit is set (False for sentinel ids < 0)."""
    safe = jnp.maximum(ids, 0)
    word = safe >> 5
    bit = (safe & 31).astype(jnp.uint32)
    w = jnp.take_along_axis(bits, word, axis=1)
    hit = (w >> bit) & jnp.uint32(1)
    return jnp.where(ids < 0, False, hit.astype(jnp.bool_))


def bitset_set(bits: jax.Array, ids: jax.Array, mask: jax.Array) -> jax.Array:
    """Set the bits of `ids[b, k]` where `mask[b, k]`.

    Implemented as a scatter-ADD of (1 << bit) into the word lane, which equals
    bitwise-OR iff (a) each masked id's bit is currently 0 and (b) no id appears
    twice under the mask in a row.  The search engine guarantees both: ids are
    first-occurrence-deduped and pre-filtered by `bitset_test` (a masked id was
    not yet visited).  Two *distinct* ids sharing a word always differ in `bit`,
    so concurrent adds into one word are disjoint bits — an exact OR.
    """
    safe = jnp.maximum(ids, 0)
    word = jnp.where(mask, safe >> 5, 0)
    bit = (safe & 31).astype(jnp.uint32)
    val = jnp.where(mask, jnp.uint32(1) << bit, jnp.uint32(0))
    return jax.vmap(lambda b, w, v: b.at[w].add(v))(bits, word, val)


def first_occurrence_mask(ids: jax.Array) -> jax.Array:
    """bool[B, K]: True on the first occurrence of each id within its row.

    Defensive dedup before `bitset_set` (duplicate ids in an adjacency row are
    a build-invariant violation, but a duplicate would corrupt the scatter-add
    OR; K is small so the O(K²) comparison is cheap on the VPU)."""
    eq = ids[:, :, None] == ids[:, None, :]  # [B, K, K]
    k = ids.shape[1]
    earlier = jnp.tril(jnp.ones((k, k), dtype=bool), k=-1)
    return ~jnp.any(eq & earlier, axis=2)
