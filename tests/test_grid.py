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


class TestRollbackTombstones:
    def test_overflow_rollback_keeps_wrapped_chain_walkable(self):
        # Regression (deterministic wrap-around): two keys hash to the LAST
        # table cell; the race loser wraps to cell 0. Capacity admits only
        # one new block, and phase-2 assigns slots in table-index order, so
        # cell 0 (the wrapped key) fits and the home cell (last index) is
        # rolled back. Rolling back to EMPTY used to leave lookup(wrapped
        # key) hitting EMPTY at its home position -> -1: a placed, counted
        # block becomes unreachable. TOMBSTONE keeps the chain walkable.
        table_size = 8
        capacity = 1
        extent = 512
        # coords (x, 0, 0) for x in {-499, -498}: mix(packed) & 7 == 7
        coords = jnp.array([[-499, 0, 0], [-498, 0, 0]], jnp.int32)
        keys = bhash.pack_block_coords(coords, extent)
        assert all(int(bhash.mix(k)) & 7 == 7 for k in np.asarray(keys))
        tk = jnp.full((table_size,), bhash.EMPTY_KEY)
        ts = jnp.full((table_size,), -1, jnp.int32)
        bc = jnp.zeros((capacity, 3), jnp.int32)
        tk, ts, bc, nb, ov = bhash.insert(tk, ts, bc, jnp.int32(0), keys,
                                          jnp.ones(2, bool), table_size,
                                          capacity, extent)
        assert int(nb) == 1 and int(ov) == 1
        slots = np.asarray(bhash.lookup(tk, ts, keys, table_size))
        # exactly one key is allocated AND reachable
        assert sorted(slots) == [-1, 0], f"leaked slot: lookup={slots}"
        # the allocated block's recorded coords match the reachable key
        placed = coords[slots == 0][0]
        np.testing.assert_array_equal(np.asarray(bc[0]), np.asarray(placed))
        # a later batch can reclaim the tombstoned home cell
        k3 = bhash.pack_block_coords(jnp.array([[5, 5, 5]], jnp.int32),
                                     extent)
        tk, ts, bc, nb, ov = bhash.insert(tk, ts, bc, nb, k3,
                                          jnp.ones(1, bool), table_size,
                                          capacity, extent)
        assert int(nb) == 1  # full; overflows but table state stays sane
        slots = np.asarray(bhash.lookup(tk, ts, keys, table_size))
        assert sorted(slots) == [-1, 0]
