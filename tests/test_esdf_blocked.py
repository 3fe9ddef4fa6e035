"""Block-sparse ESDF: brute-force Euclidean oracle + corridor-memory tests
(VERDICT r1 item 5)."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import fast
from kimera_semantics_tpu.ops import esdf as esdf_ops

INTR = PinholeIntrinsics(fx=40.0, fy=40.0, cx=39.5, cy=29.5, width=80,
                         height=60)
CFG = FusionConfig(
    grid=GridConfig(voxel_size=0.2, voxels_per_side=8, block_capacity=512),
    tsdf=TsdfConfig(truncation_distance=0.4, max_ray_length_m=4.0),
    pipeline=PipelineConfig(max_rays=2048, dedup_table_size=1 << 14,
                            segment_budget=1 << 16, carve_budget=4096,
                            carve_steps=16))


def multi_object_grid():
    ds = SyntheticDataset(num_frames=4, intr=INTR,
                          label_map=LabelColorMap.random(21))
    g = blocks.create(CFG)
    for i in range(4):
        g = fast.integrate_frame(g, ds.frame(i), CFG, INTR)
    return g


def test_blocked_matches_brute_force_euclidean():
    """Max error vs the exact nearest-seed Euclidean distance < 1 voxel
    outside the truncation band, on the multi-object eval world."""
    g = multi_object_grid()
    max_dist = 1.6
    res = esdf_ops.compute_esdf_blocked(g, CFG, max_dist=max_dist)
    nb = res.block_coords.shape[0]
    vps = res.vps
    v = CFG.grid.voxel_size
    trunc = CFG.tsdf.truncation_distance

    # Reconstruct seeds exactly as compute_esdf_blocked does.
    tsdf = np.asarray(blocks.tsdf_distance(g, trunc))[:nb]
    wsum = np.asarray(g.wsum)[:nb]
    li = np.arange(vps, dtype=np.float32) + 0.5
    lx, ly, lz = np.meshgrid(li, li, li, indexing="ij")
    local = np.stack([lx, ly, lz], axis=-1).reshape(-1, 3)
    centers = ((res.block_coords[:, None, :] * vps + local[None]) * v
               ).astype(np.float32)                         # (nb, vps^3, 3)
    observed = wsum > 1e-6
    near = observed & (np.abs(tsdf) < trunc * 0.99)
    seeds = centers[near]
    resid = np.abs(tsdf[near])

    rng = np.random.RandomState(0)
    cand = np.argwhere(observed & ~near)
    sel = cand[rng.choice(len(cand), size=min(3000, len(cand)),
                          replace=False)]
    pts = centers[sel[:, 0], sel[:, 1]]
    # Brute force in chunks (seeds ~ tens of thousands).
    brute = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), 256):
        d = np.linalg.norm(pts[i:i + 256, None, :] - seeds[None], axis=-1)
        brute[i:i + 256] = (d + resid[None]).min(axis=1)
    brute = np.clip(brute, 0.0, max_dist)
    ours = np.abs(res.distance[sel[:, 0], sel[:, 1]])
    err = np.abs(ours - brute)
    assert float(err.max()) < v, f"max ESDF error {err.max():.4f} >= voxel"


def test_neighbor_tables_match_dict_and_scale():
    """The vectorized sort/searchsorted table build (VERDICT r2 item 7) must
    (a) agree with the naive dict construction, (b) build 20k-block tables in
    well under a second (the dict loops took seconds at this scale)."""
    import time
    rng = np.random.RandomState(7)
    ext = 512
    # Dense-ish cluster so real neighbors exist at every level.
    coords = np.unique(rng.randint(-40, 40, size=(20000, 3)).astype(np.int32),
                       axis=0)
    nb = len(coords)
    ks = [1, 2, 4]
    t0 = time.perf_counter()
    tables = esdf_ops.neighbor_tables(coords, ks, ext)
    dt = time.perf_counter() - t0
    assert dt < 1.0, f"table build took {dt:.2f}s at {nb} blocks"
    own = {tuple(c): i for i, c in enumerate(coords)}
    sample = rng.choice(nb, size=500, replace=False)
    for k in ks:
        t = tables[k]
        for a in range(3):
            for si, sgn in enumerate((1, -1)):
                off = np.zeros(3, np.int32)
                off[a] = sgn * k
                for i in sample:
                    exp = own.get(tuple(coords[i] + off), nb)
                    assert t[i, a * 2 + si] == exp, (k, a, si, i)


def test_corridor_memory_is_block_sparse():
    """A 100 m corridor (diagonal line of blocks) must cost O(blocks), not
    O(AABB^3): the round-1 dense path would materialize 63^3 = 250k blocks
    here; the blocked path touches exactly the allocated 64."""
    n = 64  # blocks along the diagonal -> ~100 m at 1.6 m/block
    cfg = dataclasses.replace(
        CFG, grid=dataclasses.replace(CFG.grid, voxel_size=0.2,
                                      voxels_per_side=8, block_capacity=128))
    g = blocks.create(cfg)
    coords = jnp.asarray(np.stack([np.arange(n)] * 3, axis=-1), jnp.int32)
    g = blocks.allocate_blocks(g, coords, jnp.ones((n,), bool), cfg.grid)
    # Synthetic observed band: every block's first voxel is a surface seed.
    slots = blocks.lookup_slots(g, coords, cfg.grid)
    wsum = g.wsum.at[slots, :].set(1.0)
    wsdf = g.wsdf.at[slots, :].set(1.0 * cfg.tsdf.truncation_distance)
    wsdf = wsdf.at[slots, 0].set(0.01)
    g = dataclasses.replace(g, wsum=wsum, wsdf=wsdf)

    res = esdf_ops.compute_esdf_blocked(g, cfg, max_dist=2.0)
    assert res.distance.shape == (n, 8 ** 3)
    assert res.observed.all()
    assert np.isfinite(res.distance).all()
    # sample() resolves global voxel coords through the sparse table.
    probe = np.array([[4, 4, 4], [8 * (n - 1) + 1, 8 * (n - 1) + 1,
                      8 * (n - 1) + 1]])
    vals = res.sample(probe)
    assert np.isfinite(vals).all()
    nan = res.sample(np.array([[-5, -5, -5]]))
    assert np.isnan(nan).all()
