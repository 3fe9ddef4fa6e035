"""Staged Pallas RMW apply vs the plain XLA scatter tail (r4).

The segment-mode apply has two equivalent forms (ops/integrate.py):
`staged_apply=True` routes the reduced (voxel, label) segments through
compact group-aligned staging + the aliased block_rmw_add kernel (the TPU
production path — immune to the slow-scatter runtime regime documented in
_staged_segment_apply); `False` is the plain XLA scatter tail (the CPU/
debug form, and the form the golden pins were computed with). They must
agree to fp tolerance on every grid channel, including the merged
integrator's sparse vote path and multi-label voxels.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (ColorMode, FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.grid import blocks


def make_cfg(staged, color_mode=ColorMode.SEMANTIC,
             sem_stage_mode="dense", sem_stage_ranks=8):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=64),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=3.0,
                        voxel_carving_enabled=True),
        semantic=SemanticConfig(color_mode=color_mode),
        pipeline=PipelineConfig(max_rays=16, dedup_table_size=1 << 10,
                                max_steps=32, block_budget=64,
                                staged_apply=staged,
                                sem_stage_mode=sem_stage_mode,
                                sem_stage_ranks=sem_stage_ranks),
    )


def _run(cfg, sem_points=None):
    from kimera_semantics_tpu.ops import integrate as integ

    rng = np.random.RandomState(7)
    R = 16
    origin = jnp.asarray(np.array([0.1, 0.0, 0.2], np.float32))
    pts = jnp.asarray((np.array([0.1, 0.0, 0.2])
                       + rng.uniform(-2, 2, (R, 3))).astype(np.float32))
    weights = jnp.asarray(rng.uniform(0.5, 2.0, R).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 255, (R, 3)).astype(np.float32))
    # Many distinct labels so single voxels collect >4 labels (the near-
    # origin voxels see every ray) — exercises the dense sem staging.
    labels = jnp.asarray(rng.randint(0, 21, R).astype(np.int32))
    if sem_points is not None:
        labels = jnp.zeros((R,), jnp.int32)  # uninformative (vote contract)
    clr = jnp.zeros(R, dtype=bool)
    valid = jnp.ones(R, dtype=bool)

    integ.FORCE_PALLAS_INTERPRET = True
    try:
        g = integ.integrate_ray_batch(
            blocks.create(cfg), cfg, origin, pts, weights, colors, labels,
            clr, valid, sem_points=sem_points)
    finally:
        integ.FORCE_PALLAS_INTERPRET = False
    return g


def _compare(ga, gb, cfg, fields=("wsum", "wsdf", "sem_count", "sem_delta",
                                  "wcolor")):
    assert int(ga.n_blocks) == int(gb.n_blocks)
    coords = np.asarray(ga.block_coords)[:int(ga.n_blocks)]
    s_a = np.asarray(blocks.lookup_slots(ga, jnp.asarray(coords), cfg.grid))
    s_b = np.asarray(blocks.lookup_slots(gb, jnp.asarray(coords), cfg.grid))
    for f in fields:
        a, b = np.asarray(getattr(ga, f)), np.asarray(getattr(gb, f))
        if a.ndim == 3:        # (L|3, rows, V3) channel-major
            a, b = a[:, s_a], b[:, s_b]
        else:
            a, b = a[s_a], b[s_b]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=f)
    assert int(ga.overflow) == int(gb.overflow)


@pytest.mark.parametrize("color_mode", [ColorMode.SEMANTIC, ColorMode.COLOR])
def test_staged_matches_plain(color_mode):
    g_staged = _run(make_cfg(True, color_mode))
    g_plain = _run(make_cfg(False, color_mode))
    _compare(g_staged, g_plain, make_cfg(True, color_mode))


def test_staged_matches_plain_with_votes():
    """Merged-integrator vote path (sem_points) through the staging."""
    rng = np.random.RandomState(3)
    P = 64
    sem_points = (jnp.asarray(rng.randint(0, 16, P).astype(np.int32)),
                  jnp.asarray(rng.randint(1, 21, P).astype(np.int32)),
                  jnp.ones((P,), bool),
                  jnp.asarray(rng.uniform(1, 3, P).astype(np.float32)))
    g_staged = _run(make_cfg(True), sem_points=sem_points)
    g_plain = _run(make_cfg(False), sem_points=sem_points)
    _compare(g_staged, g_plain, make_cfg(True))


def test_packed_ranks_match_dense_when_wide_enough():
    """Packed rank staging with P = L is exact (covers any multiplicity)."""
    g_packed = _run(make_cfg(True, sem_stage_mode="packed",
                             sem_stage_ranks=21))
    g_plain = _run(make_cfg(False))
    _compare(g_packed, g_plain, make_cfg(True))


def test_packed_rank_overflow_counted():
    """Votes past rank P-1 drop and count in overflow (P=1 forces it:
    near-origin voxels see every ray's label under full carving)."""
    g1 = _run(make_cfg(True, sem_stage_mode="packed", sem_stage_ranks=1))
    g_plain = _run(make_cfg(False))
    assert int(g1.overflow) > int(g_plain.overflow)


def test_staged_matches_plain_batched_rows():
    """Batched dispatches (cube_origin (B, 3)) ride the staging with a
    B-scaled row budget (r5, VERDICT r4 item 3) — must still match the
    plain tail exactly."""
    from kimera_semantics_tpu.ops import integrate as integ

    rng = np.random.RandomState(11)
    R = 16
    origin = jnp.asarray(np.array([0.1, 0.0, 0.2], np.float32))
    pts = jnp.asarray((np.array([0.1, 0.0, 0.2])
                       + rng.uniform(-2, 2, (R, 3))).astype(np.float32))
    weights = jnp.asarray(rng.uniform(0.5, 2.0, R).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 255, (R, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, R).astype(np.int32))
    clr = jnp.zeros(R, dtype=bool)
    valid = jnp.ones(R, dtype=bool)
    cube2 = jnp.stack([origin, origin])          # (2, 3): B=2 dispatch

    def run(cfg):
        integ.FORCE_PALLAS_INTERPRET = True
        try:
            return integ.integrate_ray_batch(
                blocks.create(cfg), cfg, origin, pts, weights, colors,
                labels, clr, valid, cube_origin=cube2)
        finally:
            integ.FORCE_PALLAS_INTERPRET = False

    def widen(cfg):
        # capacity > block_budget so the B-scaled Kb (2 x 64 = 128)
        # actually exceeds the single-frame budget (the cap clamp would
        # otherwise hide the scaling).
        return dataclasses.replace(
            cfg, grid=dataclasses.replace(cfg.grid, block_capacity=128))

    g_staged = run(widen(make_cfg(True)))
    g_plain = run(widen(make_cfg(False)))
    _compare(g_staged, g_plain, widen(make_cfg(True)))


def test_block_budget_overflow_counted():
    """Blocks beyond the staged row budget drop and count in overflow."""
    cfg = dataclasses.replace(
        make_cfg(True),
        pipeline=dataclasses.replace(make_cfg(True).pipeline, block_budget=8))
    g = _run(cfg)
    assert int(g.overflow) > 0
