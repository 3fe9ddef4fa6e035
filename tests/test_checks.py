"""Invariant-validator tests (utils/checks.py — the reference's CHECK/DCHECK
contract surface, SURVEY §4.1)."""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         IntegratorType, PipelineConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import factory
from kimera_semantics_tpu.utils import checks

INTR = PinholeIntrinsics(fx=60.0, fy=60.0, cx=39.5, cy=29.5, width=80,
                         height=60)


def small_cfg(**kw):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=768),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        pipeline=PipelineConfig(max_rays=4096, dedup_table_size=1 << 14),
        **kw)


@pytest.mark.parametrize("kind", ["fast", "merged", "projective"])
def test_integrated_grid_passes(kind):
    cfg = small_cfg(integrator=IntegratorType(kind))
    lmap = LabelColorMap.random()
    ds = SyntheticDataset(num_frames=4, intr=INTR, label_map=lmap)
    integ = factory.create(kind, cfg, INTR)
    grid = blocks.create(cfg)
    for f in ds:
        grid = integ.integrate(grid, f)
    stats = checks.validate_grid(grid, cfg)
    assert stats["n_blocks"] > 10
    assert stats["observed_voxels"] > 100
    assert 0 < stats["table_load"] < 1


def test_empty_grid_passes():
    cfg = small_cfg()
    stats = checks.validate_grid(blocks.create(cfg), cfg)
    assert stats == {"n_blocks": 0, "overflow": 0, "dropped_rays": 0,
                     "observed_voxels": 0, "table_load": 0.0}


def test_corruptions_detected():
    cfg = small_cfg()
    lmap = LabelColorMap.random()
    ds = SyntheticDataset(num_frames=2, intr=INTR, label_map=lmap)
    integ = factory.create("fast", cfg, INTR)
    grid = blocks.create(cfg)
    for f in ds:
        grid = integ.integrate(grid, f)
    checks.validate_grid(grid, cfg)  # sanity: clean grid passes

    bad = dataclasses.replace(grid, wsum=grid.wsum.at[0, 0].set(jnp.nan))
    with pytest.raises(checks.InvariantError, match="V1"):
        checks.validate_grid(bad, cfg)

    bad = dataclasses.replace(grid, wsum=grid.wsum.at[0, 0].set(-1.0))
    with pytest.raises(checks.InvariantError, match="V"):
        checks.validate_grid(bad, cfg)

    bad = dataclasses.replace(
        grid, wsdf=grid.wsdf.at[0, 0].set(
            float(grid.wsum[0, 0]) * cfg.tsdf.truncation_distance * 3 + 1))
    with pytest.raises(checks.InvariantError, match="V3"):
        checks.validate_grid(bad, cfg)

    bad = dataclasses.replace(grid, n_blocks=jnp.int32(int(grid.n_blocks) + 1))
    with pytest.raises(checks.InvariantError, match="H"):
        checks.validate_grid(bad, cfg)

    # duplicate slot id in the table
    ts = np.asarray(grid.table_slots).copy()
    pos = np.flatnonzero(ts >= 0)
    ts[pos[0]] = ts[pos[1]]
    bad = dataclasses.replace(grid, table_slots=jnp.asarray(ts))
    with pytest.raises(checks.InvariantError, match="H3"):
        checks.validate_grid(bad, cfg)
