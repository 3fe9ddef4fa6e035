"""Projective-integrator correctness: mip atlas, patch metadata containment,
sampler-mode equivalence, a from-scratch NumPy oracle of the per-voxel update
semantics, and the Pallas blockwise-apply kernel vs the XLA scatter path."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kimera_semantics_tpu.config import (ColorMode, FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core import transforms
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.core.color import LabelColorMap
from kimera_semantics_tpu.grid import blocks
from kimera_semantics_tpu.io.dataset import SyntheticDataset
from kimera_semantics_tpu.models import projective as proj_model
from kimera_semantics_tpu.ops import mip as mip_ops
from kimera_semantics_tpu.ops import projective as proj_ops
from kimera_semantics_tpu.ops.integrate import make_likelihood_cached

INTR = PinholeIntrinsics(fx=60.0, fy=60.0, cx=39.5, cy=29.5, width=80,
                         height=60)


def cfg_small(**kw):
    return FusionConfig(
        grid=GridConfig(voxel_size=0.25, voxels_per_side=8,
                        block_capacity=768),
        tsdf=TsdfConfig(truncation_distance=0.5, max_ray_length_m=8.0),
        semantic=SemanticConfig(semantic_measurement_probability=0.8),
        pipeline=PipelineConfig(block_budget=256, alloc_stride=4),
        **kw,
    )


class TestMip:
    def test_plan(self):
        plan = mip_ops.make_plan(480, 640)
        assert plan.full_level == 3 and plan.num_levels == 4
        assert plan.widths == (640, 320, 160, 80)
        assert plan.offsets[1] == 640 and plan.atlas_width % 128 == 0
        assert plan.atlas_height % 8 == 0

    def test_min_pool_follows_argmin(self):
        rng = np.random.RandomState(0)
        d = rng.uniform(0.5, 5.0, (8, 8)).astype(np.float32)
        lab = rng.randint(0, 9, (8, 8)).astype(np.float32)
        chans = jnp.stack([jnp.asarray(d), jnp.asarray(lab)])
        out = np.asarray(mip_ops._min_pool_with_payload(chans))
        for i in range(4):
            for j in range(4):
                cell_d = d[2 * i:2 * i + 2, 2 * j:2 * j + 2]
                cell_l = lab[2 * i:2 * i + 2, 2 * j:2 * j + 2]
                k = np.unravel_index(np.argmin(cell_d), (2, 2))
                assert out[0, i, j] == cell_d[k]
                assert out[1, i, j] == cell_l[k]

    def test_invalid_depth_sentinel(self):
        d = jnp.array([[0.0, np.nan], [2.0, -1.0]], dtype=jnp.float32)
        lab = jnp.zeros((2, 2), jnp.int32)
        col = jnp.zeros((2, 2, 3), jnp.float32)
        plan = mip_ops.make_plan(2, 2)
        atlas = np.asarray(mip_ops.build_atlas(d, lab, col, plan))
        assert atlas[0, 0, 0] == mip_ops.DEPTH_SENTINEL
        assert atlas[0, 1, 0] == 2.0
        assert np.all(np.isfinite(atlas))

    def test_color_pack_roundtrip(self):
        rng = np.random.RandomState(1)
        c = rng.randint(0, 256, (4, 4, 3)).astype(np.float32)
        plan = mip_ops.make_plan(4, 4)
        atlas = mip_ops.build_atlas(jnp.ones((4, 4)), jnp.zeros((4, 4)),
                                    jnp.asarray(c), plan)
        rgb = np.asarray(mip_ops.unpack_color(atlas[2, :4, :4],
                                              atlas[3, :4, :4]))
        np.testing.assert_array_equal(rgb, c)

    def test_wire_codec_bounds(self):
        """u16 wire (r5 sharded exchange): labels/colors lossless, depth
        quantized within half a step, invalid sentinel preserved, and the
        roundtrip is idempotent (own-decode == remote-decode)."""
        cfg = dataclasses.replace(
            cfg_small(),
            semantic=SemanticConfig(color_mode=ColorMode.COLOR))
        rng = np.random.RandomState(2)
        d = rng.uniform(0.1, 12.0, (8, 8)).astype(np.float32)
        d[0, 0] = np.nan
        d[0, 1] = 0.0
        d[0, 2] = -3.0
        lab = rng.randint(0, 21, (8, 8)).astype(np.int32)
        col = rng.randint(0, 256, (8, 8, 3)).astype(np.float32)
        plan = mip_ops.make_plan(8, 8)
        ref = np.asarray(mip_ops.build_atlas(
            jnp.asarray(d), jnp.asarray(lab), jnp.asarray(col), plan))
        planes = mip_ops.wire_encode(jnp.asarray(ref), cfg)
        assert planes[0].dtype == jnp.uint16      # depth
        assert planes[1].dtype == jnp.uint8       # labels (<= 256)
        assert planes[2].dtype == jnp.uint16      # rg packed
        assert planes[3].dtype == jnp.uint8       # b
        atlas = np.asarray(mip_ops.atlas_from_wire(planes, cfg))
        dmax = mip_ops.wire_depth_max(cfg)
        # Depth: sentinel preserved exactly; fine range quantized <=
        # step/2; far range (feeds only the 1/z^2 carve weight) quantized
        # at the coarse far step — NOT clipped to dmax (clipping would
        # inflate far-pixel clearing weights (true/dmax)^2; review r5).
        sen = ref[0] >= mip_ops.DEPTH_SENTINEL
        assert np.all(atlas[0][sen] == mip_ops.DEPTH_SENTINEL)
        step = dmax / (mip_ops._WIRE_FINE_CODES - 1.0)
        inr = ~sen & (ref[0] <= dmax)
        assert np.max(np.abs(atlas[0][inr] - ref[0][inr])) <= step / 2 + 1e-7
        far_hi = max(mip_ops._WIRE_FAR_MAX, dmax * 2.0)
        far_step = (far_hi - dmax) / (65534.0 - mip_ops._WIRE_FINE_CODES)
        far = ~sen & (ref[0] > dmax)
        assert np.max(np.abs(atlas[0][far] - ref[0][far])) \
            <= far_step / 2 + 1e-6
        # Labels and packed colors: lossless.
        np.testing.assert_array_equal(atlas[1], ref[1])
        np.testing.assert_array_equal(atlas[2], ref[2])
        np.testing.assert_array_equal(atlas[3], ref[3])
        # Idempotent: decode(encode(decoded)) == decoded.
        again = np.asarray(mip_ops.atlas_from_wire(
            mip_ops.wire_encode(jnp.asarray(atlas), cfg), cfg))
        np.testing.assert_array_equal(again, atlas)

    def test_wire_codec_semantic_drops_color(self):
        cfg = cfg_small()  # default color mode = SEMANTIC
        plan = mip_ops.make_plan(4, 4)
        ref = mip_ops.build_atlas(jnp.ones((4, 4)),
                                  jnp.zeros((4, 4), jnp.int32),
                                  jnp.full((4, 4, 3), 99.0), plan)
        planes = mip_ops.wire_encode(ref, cfg)
        assert len(planes) == 2                   # no color planes shipped
        atlas = np.asarray(mip_ops.atlas_from_wire(planes, cfg))
        assert np.all(atlas[2:] == 0.0)


class TestPatchMeta:
    def test_containment(self):
        """Every in-image voxel of every block must land inside its window."""
        cfg = cfg_small()
        plan = mip_ops.make_plan(INTR.height, INTR.width,
                                 cfg.pipeline.patch_rows,
                                 cfg.pipeline.patch_cols)
        rng = np.random.RandomState(2)
        T_G_C = np.asarray(SyntheticDataset(num_frames=8, intr=INTR).pose(3))
        T_C_G = np.asarray(transforms.inverse(jnp.asarray(T_G_C)))
        bc = rng.randint(-6, 6, (64, 3)).astype(np.int32)
        lvl, u0, v0, _ = jax.tree.map(np.asarray, proj_ops.block_patch_meta(
            jnp.asarray(bc), jnp.asarray(T_C_G), INTR, plan,
            cfg.grid.block_size))
        vps = cfg.grid.voxels_per_side
        for k in range(64):
            corners = (bc[k][None] + np.array(
                [[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)])
            ) * cfg.grid.block_size
            cam = corners @ T_C_G[:3, :3].T + T_C_G[:3, 3]
            if not np.all(cam[:, 2] > 1e-3):
                continue  # fallback level: full image fits by construction
            # dense voxel centers
            lin = np.arange(vps ** 3)
            loc = np.stack([lin // vps ** 2, (lin // vps) % vps, lin % vps], 1)
            ctr = (bc[k][None] * vps + loc + 0.5) * cfg.grid.voxel_size
            cc = ctr @ T_C_G[:3, :3].T + T_C_G[:3, 3]
            z = cc[:, 2]
            sel = z > 1e-3
            u = np.floor(60.0 * cc[sel, 0] / z[sel] + 39.5 + 0.5).astype(int)
            v = np.floor(60.0 * cc[sel, 1] / z[sel] + 29.5 + 0.5).astype(int)
            inimg = (u >= 0) & (u < 80) & (v >= 0) & (v < 60)
            col = (u[inimg] >> lvl[k]) - u0[k]
            row = (v[inimg] >> lvl[k]) - v0[k]
            assert np.all((col >= 0) & (col < plan.col_window)), k
            assert np.all((row >= 0) & (row < plan.row_window)), k
            assert v0[k] % 8 == 0  # Mosaic slice alignment contract


class TestSampler:
    def test_onehot_matches_gather(self):
        rng = np.random.RandomState(3)
        K, C, win, V3 = 6, 4, 32, 512
        patches = jnp.asarray(
            rng.uniform(0, 7.0, (K, C, win, win)).astype(np.float32))
        row = jnp.asarray(rng.randint(-2, win + 2, (K, V3)).astype(np.int32))
        col = jnp.asarray(rng.randint(-2, win + 2, (K, V3)).astype(np.int32))
        a = np.asarray(proj_ops.sample_patches(patches, row, col, "gather"))
        b = np.asarray(proj_ops.sample_patches(patches, row, col, "onehot"))
        assert np.max(np.abs(a - b)) < 1e-3  # bf16 hi/lo split bound

    def test_onehot_integer_channels_exact(self):
        rng = np.random.RandomState(4)
        K, win, V3 = 4, 16, 256
        ints = rng.randint(0, 65536, (K, 2, win, win)).astype(np.float32)
        row = jnp.asarray(rng.randint(0, win, (K, V3)).astype(np.int32))
        col = jnp.asarray(rng.randint(0, win, (K, V3)).astype(np.int32))
        a = np.asarray(proj_ops.sample_patches(jnp.asarray(ints), row, col,
                                               "gather"))
        b = np.asarray(proj_ops.sample_patches(jnp.asarray(ints), row, col,
                                               "onehot"))
        np.testing.assert_array_equal(np.round(b), a)


def numpy_projective_oracle(bc, real, depth, labels, colors, T_G_C, intr,
                            cfg):
    """Independent per-voxel reimplementation of voxel_deltas semantics."""
    g, t, sem = cfg.grid, cfg.tsdf, cfg.semantic
    vps, V3, L = g.voxels_per_side, g.vps3, g.num_labels
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    # numpy mip pyramid (min-depth argmin-payload)
    d0 = np.where(np.isfinite(depth) & (depth > 0), depth,
                  mip_ops.DEPTH_SENTINEL).astype(np.float32)
    levels = [(d0, labels.astype(np.int32), colors.astype(np.float32))]
    for l in range(1, plan.num_levels):
        dp, lp, cp = levels[-1]
        h, w = dp.shape
        dn = np.empty((h // 2, w // 2), np.float32)
        ln = np.empty((h // 2, w // 2), np.int32)
        cn = np.empty((h // 2, w // 2, 3), np.float32)
        for i in range(h // 2):
            for j in range(w // 2):
                cell = dp[2 * i:2 * i + 2, 2 * j:2 * j + 2]
                # row-major argmin != the pairwise reduction order for exact
                # ties; the pooled data has no ties in this test
                k = np.unravel_index(np.argmin(cell), (2, 2))
                dn[i, j] = cell[k]
                ln[i, j] = lp[2 * i + k[0], 2 * j + k[1]]
                cn[i, j] = cp[2 * i + k[0], 2 * j + k[1]]
        levels.append((dn, ln, cn))

    T_C_G = np.linalg.inv(T_G_C)
    lk = make_likelihood_cached(cfg)
    K = bc.shape[0]
    out = {"w": np.zeros((K, V3), np.float32),
           "wsdf": np.zeros((K, V3), np.float32),
           "cnt": np.zeros((K, V3), np.float32),
           "sem": np.zeros((K, L, V3), np.float32),
           "wcolor": np.zeros((K, 3, V3), np.float32)}
    corners8 = np.array([[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)],
                        np.float32)
    for k in range(K):
        if not real[k]:
            continue
        # level selection (mirrors block_patch_meta)
        cam8 = ((bc[k][None] + corners8) * g.block_size) @ T_C_G[:3, :3].T \
            + T_C_G[:3, 3]
        if np.all(cam8[:, 2] > 1e-3):
            u8 = intr.fx * cam8[:, 0] / cam8[:, 2] + intr.cx
            v8 = intr.fy * cam8[:, 1] / cam8[:, 2] + intr.cy
            need = max((u8.max() - u8.min()) / plan.col_threshold,
                       (v8.max() - v8.min()) / plan.row_threshold)
            lvl = int(np.clip(math.ceil(math.log2(max(need, 1.0))),
                              0, plan.full_level))
        else:
            lvl = plan.full_level
        dl, ll, cl = levels[lvl]
        for lin in range(V3):
            loc = np.array([lin // vps ** 2, (lin // vps) % vps, lin % vps])
            ctr = (bc[k] * vps + loc + 0.5) * g.voxel_size
            p = T_C_G[:3, :3] @ ctr + T_C_G[:3, 3]
            if p[2] <= 1e-3:
                continue
            u = int(np.floor(intr.fx * p[0] / p[2] + intr.cx + 0.5))
            v = int(np.floor(intr.fy * p[1] / p[2] + intr.cy + 0.5))
            if not (0 <= u < intr.width and 0 <= v < intr.height):
                continue
            z_px = dl[v >> lvl, u >> lvl]
            lab = int(ll[v >> lvl, u >> lvl])
            rgb = cl[v >> lvl, u >> lvl]
            if not (0 < z_px < mip_ops.DEPTH_SENTINEL * 0.5):
                continue
            t_v = float(np.linalg.norm(p))
            ray_norm = t_v * z_px / p[2]
            if ray_norm < t.min_ray_length_m:
                continue
            clearing = ray_norm > t.max_ray_length_m
            if clearing and not t.allow_clear:
                continue
            if lab in sem.dynamic_labels:
                continue
            sdf = ray_norm - t_v
            if clearing:
                clear_len = np.clip(ray_norm - t.truncation_distance, 0.0,
                                    t.max_ray_length_m)
                if t.voxel_carving_enabled:
                    if t_v > clear_len:
                        continue
                elif abs(t_v - clear_len) > 0.5 * g.voxel_size:
                    continue
            else:
                if t.voxel_carving_enabled:
                    if sdf < -t.truncation_distance:
                        continue
                elif abs(sdf) > t.truncation_distance:
                    continue
            w_pt = 1.0 if t.use_const_weight else 1.0 / max(z_px * z_px,
                                                            1e-12)
            trunc = t.truncation_distance
            if t.use_weight_dropoff and sdf < -g.voxel_size:
                w_pt = max(w_pt * (trunc + sdf) / (trunc - g.voxel_size), 0.0)
            out["w"][k, lin] = w_pt
            out["wsdf"][k, lin] = w_pt * np.clip(sdf, -trunc, trunc)
            if lab != 0:
                out["cnt"][k, lin] = 1.0
                out["sem"][k, lab, lin] = lk.delta
            if cfg.semantic.color_mode == ColorMode.COLOR and \
                    abs(sdf) < trunc and w_pt > 0:
                out["wcolor"][k, :, lin] = w_pt * rgb
    return out


class TestVoxelDeltasOracle:
    @pytest.mark.parametrize("carving,color_mode", [
        (True, ColorMode.SEMANTIC), (False, ColorMode.COLOR)])
    def test_matches_numpy(self, carving, color_mode):
        cfg = cfg_small()
        cfg = dataclasses.replace(
            cfg, tsdf=dataclasses.replace(cfg.tsdf,
                                          voxel_carving_enabled=carving),
            semantic=dataclasses.replace(cfg.semantic, color_mode=color_mode))
        ds = SyntheticDataset(num_frames=6, intr=INTR,
                              label_map=LabelColorMap.random())
        fr = ds.frame(2)
        plan = mip_ops.make_plan(INTR.height, INTR.width,
                                 cfg.pipeline.patch_rows,
                                 cfg.pipeline.patch_cols)
        atlas = mip_ops.build_atlas(fr.depth, fr.labels, fr.colors, plan)
        rng = np.random.RandomState(7)
        bc = rng.randint(-8, 8, (24, 3)).astype(np.int32)
        real = np.ones(24, bool)
        real[-2:] = False
        d = proj_ops.voxel_deltas(jnp.asarray(bc), jnp.asarray(real), atlas,
                                  fr.T_G_C, INTR, plan, cfg, "gather")
        ref = numpy_projective_oracle(
            bc, real, np.asarray(fr.depth), np.asarray(fr.labels),
            np.asarray(fr.colors), np.asarray(fr.T_G_C), INTR, cfg)
        for name, tol in (("w", 1e-5), ("wsdf", 1e-5), ("cnt", 0.0),
                          ("sem", 1e-6), ("wcolor", 2e-3)):
            got = np.asarray(d[name])
            want = ref[name]
            mism = np.abs(got - want) > tol + 1e-4 * np.abs(want)
            assert not mism.any(), (
                f"{name}: {mism.sum()} mismatches, max "
                f"{np.abs(got - want).max()}")


class TestApplyPaths:
    def test_pallas_rmw_matches_scatter(self):
        cfg = cfg_small()
        ds = SyntheticDataset(num_frames=4, intr=INTR,
                              label_map=LabelColorMap.random())
        fr = ds.frame(1)
        g0 = blocks.create(cfg)

        proj_model.FORCE_PALLAS_INTERPRET = True
        try:
            cfg_p = dataclasses.replace(
                cfg, pipeline=dataclasses.replace(cfg.pipeline,
                                                  use_pallas=True))
            # jit cache keys on cfg (hashable dataclass), so the two variants
            # compile separately even with the module flag flipped.
            g_pallas = proj_model.integrate_frame(blocks.create(cfg_p), fr,
                                                  cfg_p, INTR)
        finally:
            proj_model.FORCE_PALLAS_INTERPRET = False
        cfg_x = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(cfg.pipeline, use_pallas=False))
        g_xla = proj_model.integrate_frame(blocks.create(cfg_x), fr, cfg_x,
                                           INTR)
        nb = int(g_xla.n_blocks)
        assert nb == int(g_pallas.n_blocks) and nb > 0
        # The fused kernel samples depth through the bf16 hi/lo split
        # (|err| < depth * 2^-18); the XLA path gathers exactly. Values agree
        # to that bound; band-edge voxels whose sdf sits within the split
        # error of a mask boundary may flip entirely (rare).
        for name in ("wsum", "wsdf", "sem_count", "sem_delta", "wcolor"):
            a = np.asarray(getattr(g_pallas, name))
            b = np.asarray(getattr(g_xla, name))
            sl = (slice(None), slice(0, nb)) if a.ndim == 3 else slice(0, nb)
            bad = np.abs(a[sl] - b[sl]) > 1e-3 + 1e-3 * np.abs(b[sl])
            assert bad.mean() < 5e-3, (name, bad.mean())
        del g0


class TestFrameBlockList:
    def test_group_aligned_layout(self):
        cfg = cfg_small()
        ds = SyntheticDataset(num_frames=4, intr=INTR,
                              label_map=LabelColorMap.random())
        grid = blocks.create(cfg)
        grid2, fcoords, fslots, freal = proj_model._allocate(
            grid, ds.frame(0), cfg, INTR)
        fs, real = np.asarray(fslots), np.asarray(freal)
        cap = cfg.grid.block_capacity
        budget = cfg.pipeline.block_budget
        # Group alignment: entry j covers slot group(j//8)*8 + j%8; each tile
        # is one distinct group; real tiles (slot < cap) precede trash tiles
        # (slots cap..cap+7, the grid's trash rows).
        assert np.array_equal(fs % 8, np.arange(budget) % 8)
        tile_groups = fs[::8] // 8
        real_tiles = tile_groups < cap // 8
        assert not np.any(np.diff(real_tiles.astype(int)) > 0)
        rg = tile_groups[real_tiles]
        assert np.all(np.diff(rg) > 0)            # distinct, ascending
        assert np.all(tile_groups[~real_tiles] == cap // 8)
        # real rows are exactly the touched allocated blocks
        assert real.sum() == int(grid2.n_blocks) > 0
        assert np.unique(fs[real]).size == real.sum()
        assert np.all(fs[real] < cap)
        # coords round-trip through the grid's block table
        bcs = np.asarray(grid2.block_coords)
        np.testing.assert_array_equal(bcs[fs[real]],
                                      np.asarray(fcoords)[real])


class TestBatchedProjective:
    def test_matches_sequential(self):
        # distinct cfg: integrate_frame's jit cache keys on cfg, and other
        # tests compile the same-valued cfg with FORCE_PALLAS_INTERPRET
        # (module flag, not part of the key) baked in
        cfg = cfg_small()
        cfg = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(cfg.pipeline, alloc_stride=2))
        ds = SyntheticDataset(num_frames=4, intr=INTR,
                              label_map=LabelColorMap.random())
        frames = [ds.frame(i) for i in range(3)]
        g_seq = blocks.create(cfg)
        for f in frames:
            g_seq = proj_model.integrate_frame(g_seq, f, cfg, INTR)
        import jax.numpy as jnp
        from kimera_semantics_tpu.models.common import Frame
        batched = Frame(depth=jnp.stack([f.depth for f in frames]),
                        labels=jnp.stack([f.labels for f in frames]),
                        colors=jnp.stack([f.colors for f in frames]),
                        T_G_C=jnp.stack([f.T_G_C for f in frames]))
        g_bat = proj_model.integrate_frames(blocks.create(cfg), batched, cfg,
                                            INTR)
        assert int(g_bat.n_blocks) == int(g_seq.n_blocks) > 0
        # Compare per-coordinate: the batched union allocation assigns slot
        # ids in a different (union-hash) order than sequential insertion —
        # the per-voxel state keyed by block coords must be identical.
        coords = np.asarray(g_seq.block_coords)[:int(g_seq.n_blocks)]
        ss = blocks.lookup_slots(g_seq, jnp.asarray(coords), cfg.grid)
        sb = blocks.lookup_slots(g_bat, jnp.asarray(coords), cfg.grid)
        for name in ("wsum", "wsdf", "sem_count"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_bat, name))[np.asarray(sb)],
                np.asarray(getattr(g_seq, name))[np.asarray(ss)],
                rtol=1e-6, atol=1e-6, err_msg=name)
        for name in ("sem_delta", "wcolor"):
            np.testing.assert_allclose(
                np.asarray(getattr(g_bat, name))[:, np.asarray(sb)],
                np.asarray(getattr(g_seq, name))[:, np.asarray(ss)],
                rtol=1e-6, atol=1e-6, err_msg=name)


class TestCandidateKernel:
    def test_block_dda_kernel_matches_xla(self):
        """The Pallas block-granularity candidate walk (alloc pre-pass) must
        emit exactly the XLA walk's valid block-key set."""
        from kimera_semantics_tpu.core import camera as cam, transforms
        cfg = cfg_small()
        ds = SyntheticDataset(num_frames=1, intr=INTR,
                              label_map=LabelColorMap.random())
        f = ds.frame(0)
        stride = cfg.pipeline.alloc_stride
        depth = f.depth[::stride, ::stride]
        labels = f.labels[::stride, ::stride].reshape(-1)
        import math as _math
        sub = cam.PinholeIntrinsics(
            fx=INTR.fx / stride, fy=INTR.fy / stride,
            cx=INTR.cx / stride, cy=INTR.cy / stride,
            width=int(_math.ceil(INTR.width / stride)),
            height=int(_math.ceil(INTR.height / stride)))
        pts_C, px_valid = cam.backproject(depth, sub)

        kx, vx = proj_model._candidate_keys(pts_C, labels, px_valid,
                                            f.T_G_C, cfg)
        proj_model.FORCE_PALLAS_INTERPRET = True
        try:
            kp, vp = proj_model._candidate_keys(pts_C, labels, px_valid,
                                                f.T_G_C, cfg)
        finally:
            proj_model.FORCE_PALLAS_INTERPRET = False
        a = np.unique(np.asarray(kx)[np.asarray(vx)])
        b = np.unique(np.asarray(kp)[np.asarray(vp)])
        np.testing.assert_array_equal(a, b)
        assert len(a) > 5


def test_block_meta_kernel_matches_xla():
    """pallas_kernels.block_meta (interpret) == block_patch_meta + stack,
    block-for-block (level boundaries included — both sides use the same
    comparison-ladder level selection)."""
    import numpy as np
    import jax.numpy as jnp
    from kimera_semantics_tpu.core import transforms
    from kimera_semantics_tpu.ops import mip as mip_ops
    from kimera_semantics_tpu.ops import pallas_kernels
    from kimera_semantics_tpu.ops import projective as proj_ops

    cfg = cfg_small()
    intr = INTR
    plan = mip_ops.make_plan(intr.height, intr.width,
                             cfg.pipeline.patch_rows, cfg.pipeline.patch_cols)
    rng = np.random.RandomState(2)
    K = 128
    fcoords = jnp.asarray(rng.randint(-6, 6, (K, 3)).astype(np.int32))
    freal = jnp.asarray(rng.rand(K) > 0.3)
    T_G_C = jnp.asarray(np.array(
        [[1, 0, 0, 0.2], [0, 0, -1, 0.1], [0, 1, 0, -0.4], [0, 0, 0, 1]],
        np.float32))
    T_C_G = transforms.inverse(T_G_C)
    tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
        T_C_G[:3, :4].reshape(-1))

    lvl, u0l, v0, u0a = proj_ops.block_patch_meta(
        fcoords, T_C_G, intr, plan, cfg.grid.block_size)
    ref = jnp.stack([v0, u0a, freal.astype(jnp.int32), lvl, u0l,
                     fcoords[:, 0], fcoords[:, 1], fcoords[:, 2]], axis=1)
    got = pallas_kernels.block_meta(fcoords, freal, tflat, intr, plan,
                                    cfg.grid.block_size, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
