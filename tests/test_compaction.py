"""Scan-based compaction (the deterministic queue replacement)."""

import jax.numpy as jnp
import numpy as np

from spt_tpu.ops import compaction as cp


class TestCompactIndices:
    def test_basic(self):
        mask = jnp.array([True, False, True, True, False, False, True, False])
        queue, count = cp.compact_indices(mask)
        assert int(count) == 4
        np.testing.assert_array_equal(np.asarray(queue[:4]), [0, 2, 3, 6])
        np.testing.assert_array_equal(np.asarray(queue[4:]), 0)

    def test_all_dead_and_all_live(self):
        q, c = cp.compact_indices(jnp.zeros(8, bool))
        assert int(c) == 0 and np.all(np.asarray(q) == 0)
        q, c = cp.compact_indices(jnp.ones(8, bool))
        assert int(c) == 8
        np.testing.assert_array_equal(np.asarray(q), np.arange(8))

    def test_random_matches_numpy(self, rng):
        mask = rng.uniform(size=4096) < 0.3
        queue, count = cp.compact_indices(jnp.asarray(mask))
        want = np.flatnonzero(mask)
        assert int(count) == len(want)
        np.testing.assert_array_equal(np.asarray(queue[: len(want)]), want)

    def test_conservation(self, rng):
        # every live lane appears exactly once (the reference's frame-0
        # queue-conservation check, OptixBackend.cpp:1690-1695, as a real test)
        mask = rng.uniform(size=1024) < 0.5
        queue, count = cp.compact_indices(jnp.asarray(mask))
        live = np.asarray(queue[: int(count)])
        assert len(np.unique(live)) == len(live)
        assert np.asarray(mask)[live].all()


class TestGatherScatter:
    def test_roundtrip(self, rng):
        n = 256
        mask = jnp.asarray(rng.uniform(size=n) < 0.4)
        tree = {
            "a": jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            "b": jnp.asarray(rng.integers(0, 100, size=n).astype(np.int32)),
        }
        queue, count = cp.compact_indices(mask)
        packed = cp.compact_gather(tree, queue)
        # mutate the packed live prefix
        packed = {
            "a": packed["a"] + 1.0,
            "b": packed["b"] * 2,
        }
        out = cp.scatter_back(packed, queue, tree, count)
        m = np.asarray(mask)
        np.testing.assert_allclose(
            np.asarray(out["a"])[m], np.asarray(tree["a"])[m] + 1.0
        )
        np.testing.assert_array_equal(
            np.asarray(out["a"])[~m], np.asarray(tree["a"])[~m]
        )
        np.testing.assert_array_equal(
            np.asarray(out["b"])[m], np.asarray(tree["b"])[m] * 2
        )


class TestSort:
    def test_sort_by_key_stable(self):
        key = jnp.array([2, 0, 1, 0, 2, 1], jnp.int32)
        payload = jnp.arange(6, dtype=jnp.int32)
        order, sorted_payload = cp.sort_by_key(key, payload)
        np.testing.assert_array_equal(np.asarray(sorted_payload), [1, 3, 2, 5, 0, 4])

    def test_live_count(self):
        assert int(cp.live_count(jnp.array([True, False, True]))) == 2
