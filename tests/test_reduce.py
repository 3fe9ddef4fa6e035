"""SortedUpdates (sorted segment-scatter) vs naive numpy accumulation."""

import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.ops.reduce import SortedUpdates, sorted_scatter_add


def test_matches_naive_scatter_add():
    rng = np.random.RandomState(0)
    n, m = 4096, 128
    keys = rng.randint(0, m, n).astype(np.int32)
    vals = rng.randn(n).astype(np.float32)
    out = sorted_scatter_add(jnp.zeros(m), jnp.asarray(keys), jnp.asarray(vals),
                             trash_key=-1)
    expect = np.zeros(m, np.float32)
    np.add.at(expect, keys, vals)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)


def test_trash_key_dropped():
    keys = jnp.array([0, 1, 7, 1], dtype=jnp.int32)
    vals = jnp.array([1.0, 2.0, 5.0, 3.0])
    out = sorted_scatter_add(jnp.zeros(4), keys, vals, trash_key=7)
    np.testing.assert_allclose(np.asarray(out), [1.0, 5.0, 0.0, 0.0])


def test_secondary_key_segments():
    # Two labels in the same voxel key must form distinct segments.
    keys = jnp.array([5, 5, 5, 2], dtype=jnp.int32)
    labs = jnp.array([1, 2, 1, 1], dtype=jnp.int32)
    vals = jnp.array([1.0, 10.0, 100.0, 7.0])
    su = SortedUpdates.build(keys, trash_key=-1, secondary=labs)
    sums = np.asarray(su.segment_sums(vals))
    seg_lab = np.asarray(su.secondary_at_segments())
    out_keys = np.asarray(su.out_keys)
    got = {}
    for s in range(len(out_keys)):
        if out_keys[s] >= 0 and np.asarray(su.mask)[s]:
            got[(int(out_keys[s]), int(seg_lab[s]))] = float(sums[s])
    assert got == {(2, 1): 7.0, (5, 1): 101.0, (5, 2): 10.0}


def test_multichannel_values():
    rng = np.random.RandomState(1)
    n, m = 1024, 64
    keys = rng.randint(0, m, n).astype(np.int32)
    vals = rng.randn(n, 3).astype(np.float32)
    su = SortedUpdates.build(jnp.asarray(keys), trash_key=-1)
    out = su.apply(jnp.zeros((m, 3)), jnp.asarray(vals))
    expect = np.zeros((m, 3), np.float32)
    np.add.at(expect, keys, vals)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-4, atol=1e-4)
