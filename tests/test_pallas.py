"""Pallas kernel equivalence: interpreted kernel vs the XLA SoA path.

Small shapes only — interpret mode executes step-by-step. On real TPU hardware
the compiled kernel runs the same arithmetic; bench.py exercises it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, TsdfConfig)
from kimera_semantics_tpu.grid import hash as bhash
from kimera_semantics_tpu.ops import pallas_kernels, raycast, tsdf


def make_cfg(carving=True):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8, block_capacity=64),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=3.0,
                        voxel_carving_enabled=carving),
        pipeline=PipelineConfig(max_rays=8, dedup_table_size=1 << 10,
                                max_steps=32),
    )


@pytest.mark.parametrize("carving", [True, False])
@pytest.mark.parametrize("clearing", [False, True])
def test_stream_matches_xla_path(carving, clearing):
    cfg = make_cfg(carving)
    g, t = cfg.grid, cfg.tsdf
    S = cfg.resolved_max_steps()
    rng = np.random.RandomState(11)
    R = 8
    origin = np.array([0.2, -0.1, 0.3], dtype=np.float32)
    pts = (origin + rng.uniform(-2, 2, (R, 3))).astype(np.float32)
    weights = rng.uniform(0.5, 2.0, R).astype(np.float32)
    clr = np.full(R, clearing)
    valid = np.ones(R, dtype=bool)
    valid[-1] = False

    (key_p, local_p, w_p, wsdf_p, wc_p, sv_p, run_key, run_idx) = (
        pallas_kernels.dda_update_stream(
            cfg, jnp.asarray(np.tile(origin[:, None], (1, R))),
            jnp.asarray(pts.T), jnp.asarray(weights), jnp.asarray(clr),
            jnp.asarray(valid), interpret=True))

    # XLA reference path (mirrors ops/integrate.py CPU branch).
    start_rs, end_rs = raycast.setup_rays(
        jnp.asarray(origin), jnp.asarray(pts), jnp.asarray(clr),
        voxel_size=g.voxel_size, truncation_distance=t.truncation_distance,
        max_ray_length_m=t.max_ray_length_m, voxel_carving_enabled=carving)
    voxels, sv = raycast.traverse_soa(start_rs.T, end_rs.T, S)
    vx, vy, vz = voxels[:, 0], voxels[:, 1], voxels[:, 2]
    sv = sv & jnp.asarray(valid)[None, :]
    bx, by, bz = (jnp.floor_divide(v, g.voxels_per_side) for v in (vx, vy, vz))
    sv = sv & bhash.in_bounds_soa(bx, by, bz, g.world_extent_blocks)
    keys = bhash.pack_block_coords_soa(bx, by, bz, g.world_extent_blocks)
    vps = g.voxels_per_side
    local = ((vx - bx * vps) * vps + (vy - by * vps)) * vps + (vz - bz * vps)
    sdf = tsdf.projective_sdf_soa(jnp.asarray(origin), jnp.asarray(pts),
                                  vx, vy, vz, g.voxel_size)
    w, wsdf_, gate = tsdf.update_terms(sdf, jnp.asarray(weights)[None, :], t,
                                       g.voxel_size)
    w = jnp.where(sv, w, 0.0)
    wsdf_ = jnp.where(sv, wsdf_, 0.0)
    wc = jnp.where(sv & gate, w, 0.0)

    np.testing.assert_array_equal(np.asarray(sv_p), np.asarray(sv))
    m = np.asarray(sv)
    np.testing.assert_array_equal(np.asarray(key_p)[m], np.asarray(keys)[m])
    np.testing.assert_array_equal(np.asarray(local_p)[m], np.asarray(local)[m])
    # rtol 2e-4, not 1e-5: the weight drop-off computes (trunc + sdf) with
    # sdf ~ -trunc behind the surface (catastrophic cancellation), so f32
    # fusion differences between the two compilations legitimately reach
    # ~3e-5 relative there (observed on CPU; dominates the no-carving cases).
    np.testing.assert_allclose(np.asarray(w_p)[m], np.asarray(w)[m],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wsdf_p)[m], np.asarray(wsdf_)[m],
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(wc_p)[m], np.asarray(wc)[m],
                               rtol=2e-4, atol=1e-6)
    # Invalid entries contribute nothing.
    np.testing.assert_array_equal(np.asarray(w_p)[~m], 0.0)

    # Run compaction invariant: every valid step's run maps back to its key.
    rk, ri = np.asarray(run_key), np.asarray(run_idx)
    keys_np = np.asarray(keys)
    for s in range(m.shape[0]):
        for r in range(R):
            if m[s, r]:
                assert ri[s, r] >= 0
                assert rk[ri[s, r], r] == keys_np[s, r], (s, r)


def test_integrate_pallas_interpret_matches_xla():
    """Full integrate_ray_batch equivalence: pallas(run-compacted hash path)
    vs the XLA step-level path."""
    import dataclasses as dc
    from kimera_semantics_tpu.grid import blocks
    from kimera_semantics_tpu.ops import integrate as integ

    cfg = make_cfg(True)
    rng = np.random.RandomState(5)
    R = 8
    origin = jnp.asarray(np.array([0.1, 0.0, 0.2], np.float32))
    pts = jnp.asarray((np.array([0.1, 0.0, 0.2])
                       + rng.uniform(-2, 2, (R, 3))).astype(np.float32))
    weights = jnp.asarray(rng.uniform(0.5, 2.0, R).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 255, (R, 3)).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, R).astype(np.int32))
    clr = jnp.zeros(R, dtype=bool)
    valid = jnp.ones(R, dtype=bool)

    g_xla = integ.integrate_ray_batch(
        blocks.create(cfg), cfg, origin, pts, weights, colors, labels, clr,
        valid)
    integ.FORCE_PALLAS_INTERPRET = True
    try:
        g_pal = integ.integrate_ray_batch(
            blocks.create(cfg), cfg, origin, pts, weights, colors, labels,
            clr, valid)
    finally:
        integ.FORCE_PALLAS_INTERPRET = False

    assert int(g_pal.n_blocks) == int(g_xla.n_blocks)
    # Compare voxel channels via block-coord alignment (slot ids may differ).
    coords = np.asarray(g_xla.block_coords)[:int(g_xla.n_blocks)]
    s_x = np.asarray(blocks.lookup_slots(g_xla, jnp.asarray(coords), cfg.grid))
    s_p = np.asarray(blocks.lookup_slots(g_pal, jnp.asarray(coords), cfg.grid))
    for f in ["wsum", "wsdf", "sem_count"]:
        np.testing.assert_allclose(np.asarray(getattr(g_pal, f))[s_p],
                                   np.asarray(getattr(g_xla, f))[s_x],
                                   rtol=1e-5, atol=1e-6, err_msg=f)
    np.testing.assert_allclose(np.asarray(g_pal.sem_delta)[:, s_p],
                               np.asarray(g_xla.sem_delta)[:, s_x],
                               rtol=1e-5, atol=1e-6)


def test_block_rmw_add_lane_tiled_vps32():
    """block_rmw_add at the reference's canonical vps=32 (V3=32768): the
    lane axis is split into <=8192-wide grid blocks (scoped-VMEM fit on
    TPU); interpret-mode result must equal the plain indexed add."""
    from kimera_semantics_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(3)
    V3, L, K, rows = 32768, 4, 32, 40  # K: 4 tiles of 8 rows; rows incl. trash tile
    ch = lambda *s: rng.rand(*s).astype(np.float32)
    wsum, wsdf, cnt = ch(rows, V3), ch(rows, V3), ch(rows, V3)
    sem = ch(L, rows, V3)
    wc = ch(3, rows, V3)
    d_w, d_wsdf, d_cnt = ch(K, V3), ch(K, V3), ch(K, V3)
    d_lab = rng.randint(0, L, (K, V3)).astype(np.int32)
    d_wc = ch(K, 3, V3)
    # group-aligned slots: tiles -> groups 0,2,3 and one trash tile
    tile_groups = [0, 2, 3, (rows - 8) // 8]
    slots = np.repeat(np.array(tile_groups) * 8, 8) + np.tile(np.arange(8), 4)
    lk = 1.7

    out = pk.block_rmw_add(*(jnp.asarray(a) for a in
                             (wsum, wsdf, cnt, sem, wc, slots.astype(np.int32),
                              d_w, d_wsdf, d_cnt, d_lab, d_wc)),
                           lk_delta=lk, interpret=True)
    o_w, o_wsdf, o_cnt, o_sem, o_wc = (np.asarray(o) for o in out)

    e_w, e_wsdf, e_cnt = wsum.copy(), wsdf.copy(), cnt.copy()
    e_sem, e_wc = sem.copy(), wc.copy()
    for t, grp in enumerate(tile_groups[:3]):  # trash tile skipped
        r = slice(grp * 8, grp * 8 + 8)
        d = slice(t * 8, t * 8 + 8)
        e_w[r] += d_w[d]
        e_wsdf[r] += d_wsdf[d]
        e_cnt[r] += d_cnt[d]
        onehot = (np.arange(L)[:, None, None] == d_lab[d][None])
        e_sem[:, r] += onehot * d_cnt[d][None] * lk
        e_wc[:, r] += np.transpose(d_wc[d], (1, 0, 2))
    live = slice(0, rows - 8)  # trash-tile rows are garbage by contract
    np.testing.assert_allclose(o_w[live], e_w[live], rtol=1e-6)
    np.testing.assert_allclose(o_wsdf[live], e_wsdf[live], rtol=1e-6)
    np.testing.assert_allclose(o_cnt[live], e_cnt[live], rtol=1e-6)
    np.testing.assert_allclose(o_sem[:, live], e_sem[:, live], rtol=1e-6)
    np.testing.assert_allclose(o_wc[:, live], e_wc[:, live], rtol=1e-6)
