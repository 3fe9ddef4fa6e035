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


# --- segment_compact_reduce (the "segment" scatter mode's core) -----------

from kimera_semantics_tpu.ops.reduce import (TRASH_KEY,
                                             segment_compact_reduce)


def _naive_groupby(keys, chans):
    out = {}
    for i, k in enumerate(keys):
        if k == int(TRASH_KEY):
            continue
        acc = out.setdefault(int(k), [0.0] * len(chans))
        for c, v in enumerate(chans):
            acc[c] += float(v[i])
    return out


def test_segment_compact_reduce_matches_naive():
    rng = np.random.RandomState(0)
    n = 4096
    keys = rng.randint(0, 300, n).astype(np.int32)
    keys[rng.rand(n) < 0.3] = int(TRASH_KEY)
    a = rng.rand(n).astype(np.float32)
    b = rng.rand(n).astype(np.float32)
    a[keys == int(TRASH_KEY)] = 0.0
    b[keys == int(TRASH_KEY)] = 0.0
    ok, (ta, tb), nd = segment_compact_reduce(
        jnp.asarray(keys), (jnp.asarray(a), jnp.asarray(b)), budget=512)
    ok, ta, tb = np.asarray(ok), np.asarray(ta), np.asarray(tb)
    assert int(nd) == 0
    expect = _naive_groupby(keys, (a, b))
    got_keys = ok[ok != int(TRASH_KEY)]
    assert sorted(got_keys.tolist()) == sorted(expect)
    assert np.all(np.diff(got_keys) > 0)  # unique ascending
    for i, k in enumerate(ok):
        if k == int(TRASH_KEY):
            continue
        np.testing.assert_allclose(ta[i], expect[int(k)][0], rtol=1e-5)
        np.testing.assert_allclose(tb[i], expect[int(k)][1], rtol=1e-5)


def test_segment_compact_reduce_budget_overflow():
    keys = jnp.asarray(np.arange(100, dtype=np.int32))
    vals = jnp.asarray(np.ones(100, np.float32))
    ok, (tv,), nd = segment_compact_reduce(keys, (vals,), budget=64)
    assert int(nd) == 36
    # kept segments are the 64 smallest keys, each with its total
    np.testing.assert_array_equal(np.asarray(ok), np.arange(64))
    np.testing.assert_allclose(np.asarray(tv), np.ones(64))


def test_segment_compact_reduce_all_trash():
    keys = jnp.full((128,), int(TRASH_KEY), dtype=jnp.int32)
    vals = jnp.zeros((128,), jnp.float32)
    ok, (tv,), nd = segment_compact_reduce(keys, (vals,), budget=16)
    assert int(nd) == 0
    assert np.all(np.asarray(ok) == int(TRASH_KEY))
