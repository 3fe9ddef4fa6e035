"""Property tests for the block hash table and index math (vs NumPy oracles)."""

import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.config import FusionConfig, GridConfig, PipelineConfig
from kimera_semantics_tpu.grid import blocks, hash as bhash


def small_cfg(**grid_kw):
    g = GridConfig(block_capacity=64, voxels_per_side=8, **grid_kw)
    return FusionConfig(grid=g, pipeline=PipelineConfig(dedup_table_size=1 << 12))


class TestKeyPacking:
    def test_roundtrip(self):
        rng = np.random.RandomState(0)
        coords = jnp.array(rng.randint(-512, 512, size=(1000, 3)), dtype=jnp.int32)
        keys = bhash.pack_block_coords(coords, 512)
        np.testing.assert_array_equal(bhash.unpack_block_key(keys, 512), coords)

    def test_in_bounds(self):
        c = jnp.array([[0, 0, 0], [511, -512, 5], [512, 0, 0], [0, -513, 0]])
        np.testing.assert_array_equal(bhash.in_bounds(c, 512),
                                      [True, True, False, False])


class TestIndexMath:
    def test_voxel_to_block_local_floor_semantics(self):
        # Negative coords must floor-divide (semantic_integrator_base.cpp:212-251).
        v = jnp.array([[0, 7, 8], [-1, -8, -9], [15, -16, 17]])
        block, lin = blocks.voxel_to_block_local(v, 8)
        np.testing.assert_array_equal(block, [[0, 0, 1], [-1, -1, -2], [1, -2, 2]])
        local = np.asarray(v) - np.asarray(block) * 8
        expect = (local[:, 0] * 8 + local[:, 1]) * 8 + local[:, 2]
        np.testing.assert_array_equal(lin, expect)

    def test_point_to_voxel_center_roundtrip(self):
        rng = np.random.RandomState(1)
        pts = jnp.array(rng.uniform(-10, 10, size=(500, 3)), dtype=jnp.float32)
        v = blocks.point_to_voxel(pts, 1.0 / 0.1)
        centers = blocks.voxel_center(v, 0.1)
        assert float(jnp.max(jnp.abs(centers - pts))) <= 0.05 + 1e-4


class TestHashTable:
    def test_insert_lookup_roundtrip(self):
        cfg = small_cfg()
        grid = blocks.create(cfg)
        rng = np.random.RandomState(2)
        coords = rng.randint(-40, 40, size=(200, 3))
        coords = np.unique(coords, axis=0)[:50]
        grid = blocks.allocate_blocks(
            grid, jnp.array(coords, dtype=jnp.int32),
            jnp.ones(len(coords), dtype=bool), cfg.grid)
        assert int(grid.n_blocks) == len(coords)
        assert int(grid.overflow) == 0
        slots = blocks.lookup_slots(grid, jnp.array(coords, dtype=jnp.int32),
                                    cfg.grid)
        slots = np.asarray(slots)
        assert (slots < cfg.grid.block_capacity).all()
        assert len(np.unique(slots)) == len(coords)  # one slot per block
        # block_coords back-map agrees
        np.testing.assert_array_equal(np.asarray(grid.block_coords)[slots], coords)

    def test_duplicate_insert_is_idempotent(self):
        cfg = small_cfg()
        grid = blocks.create(cfg)
        coords = jnp.array([[1, 2, 3]] * 100 + [[4, 5, 6]] * 50, dtype=jnp.int32)
        grid = blocks.allocate_blocks(grid, coords,
                                      jnp.ones(150, dtype=bool), cfg.grid)
        assert int(grid.n_blocks) == 2
        grid = blocks.allocate_blocks(grid, coords,
                                      jnp.ones(150, dtype=bool), cfg.grid)
        assert int(grid.n_blocks) == 2

    def test_missing_lookup_routes_to_trash(self):
        cfg = small_cfg()
        grid = blocks.create(cfg)
        slots = blocks.lookup_slots(grid, jnp.array([[9, 9, 9]], dtype=jnp.int32),
                                    cfg.grid)
        assert int(slots[0]) == cfg.grid.block_capacity

    def test_capacity_overflow_counted(self):
        cfg = small_cfg()
        rng = np.random.RandomState(3)
        coords = np.unique(rng.randint(-100, 100, size=(400, 3)), axis=0)[:100]
        grid = blocks.create(cfg)
        grid = blocks.allocate_blocks(
            grid, jnp.array(coords, dtype=jnp.int32),
            jnp.ones(len(coords), dtype=bool), cfg.grid)
        assert int(grid.n_blocks) == cfg.grid.block_capacity  # 64
        assert int(grid.overflow) == len(coords) - 64

    def test_incremental_inserts_match_oracle(self):
        cfg = small_cfg()
        grid = blocks.create(cfg)
        rng = np.random.RandomState(4)
        seen = {}
        for _ in range(5):
            coords = rng.randint(-2, 2, size=(30, 3))  # 64 possible sites = capacity
            grid = blocks.allocate_blocks(
                grid, jnp.array(coords, dtype=jnp.int32),
                jnp.ones(30, dtype=bool), cfg.grid)
            for c in coords:
                seen[tuple(c)] = True
            assert int(grid.n_blocks) == len(seen)
            slots = np.asarray(blocks.lookup_slots(
                grid, jnp.array(list(seen.keys()), dtype=jnp.int32), cfg.grid))
            assert (slots < cfg.grid.block_capacity).all()
            assert len(np.unique(slots)) == len(seen)
