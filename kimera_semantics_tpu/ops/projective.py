"""Projective (voxel-centric) integration core — the TPU speed path.

Where the reference's integrators walk every camera ray through the grid
(semantic_tsdf_integrator_fast.cpp:94-142), this formulation iterates the
*voxels* of the frame's touched blocks and samples the depth/label/color
images at each voxel's projected pixel — the classic GPU dense-fusion design
(KinectFusion / voxel hashing / nvblox), re-derived for TPU:

  - per-voxel image sampling is the only gather, and it is executed on the
    MXU as one-hot contractions over a per-block image patch (XLA's native
    gather costs ~11-14 ns per index *serially*; the matmul form is ~50x
    faster at these sizes — scripts/profile_projective_core2.py);
  - patches come from a mip atlas (ops/mip.py) at a per-block level chosen so
    the block's projected bbox fits a static window;
  - on TPU the whole per-voxel stage runs as ONE fused Pallas kernel
    (ops/pallas_kernels.py projective_sample_update: atlas resident in VMEM,
    in-kernel patch slice, per-block MXU one-hot dots, vectorized voxel
    math — nothing but the per-block deltas ever touches HBM); this module
    holds the shared metadata math plus the XLA reference/CPU path;
  - deltas are applied blockwise by a tiny Pallas read-modify-write kernel
    (block_rmw_add) or an XLA scatter off-TPU.

Patch windows are row_window x col_window with origins aligned to (8, 128)
— Mosaic's dynamic-slice rule — and mip levels chosen so the projected bbox
fits the window minus alignment slack (mip.MipPlan thresholds).

Update semantics per voxel mirror the ray-centric integrators exactly
(ops/tsdf.py update_terms, ops/semantic.py): the one *documented deviation*
is multiplicity — a ray-centric pass updates a voxel once per ray crossing
it, the projective pass once per frame (its nearest pixel). The reference's
own "merged" integrator (semantic_tsdf_integrator_merged.cpp:254-328) makes
the same trade (one bundled update per destination voxel); accuracy is
quantified by tests/test_projective.py and sim/eval.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import ColorMode, FusionConfig
from . import mip as mip_ops
from . import semantic as sem_ops
from . import tsdf as tsdf_ops

_Z_EPS = 1e-3


def _corner_offsets():
    import numpy as np
    c = np.array([[i >> 2 & 1, i >> 1 & 1, i & 1] for i in range(8)],
                 dtype=np.float32)
    return jnp.asarray(c)


def block_patch_meta(block_coords: jnp.ndarray, T_C_G: jnp.ndarray,
                     intr, plan: mip_ops.MipPlan, block_size: float):
    """Per-block mip level + aligned patch origin so every voxel of the block
    samples inside a (row_window x col_window) patch.

    The projection of an axis-aligned box with all corners in front of the
    camera is contained in the bbox hull of its 8 projected corners; the
    level is the smallest one at which that bbox fits the plan thresholds
    (window minus the (8, 128) origin-alignment slack). Blocks with any
    corner at/behind the camera plane fall back to `plan.full_level`, where
    the whole image fits the window, so containment always holds.

    Returns (level, u0_level, v0, u0_atlas) int32 arrays of shape (K,);
    u0_level may be negative (alignment reaches left of the level origin —
    such columns are never selected because level coords are >= 0).
    """
    R, t = T_C_G[:3, :3], T_C_G[:3, 3]
    K = block_coords.shape[0]
    return block_patch_meta_rows(
        block_coords, jnp.broadcast_to(R, (K, 3, 3)),
        jnp.broadcast_to(t, (K, 3)), intr, plan, block_size)


def block_patch_meta_rows(block_coords: jnp.ndarray, Rk: jnp.ndarray,
                          tk: jnp.ndarray, intr, plan: mip_ops.MipPlan,
                          block_size: float):
    """block_patch_meta with a PER-ROW camera transform (Rk (K, 3, 3),
    tk (K, 3)) — the mixed-frame row path (voxel_deltas_multi)."""
    corners = (block_coords.astype(jnp.float32)[:, None, :]
               + _corner_offsets()[None]) * block_size          # (K, 8, 3)
    cam = jnp.einsum("kij,kcj->kci", Rk, corners) + tk[:, None, :]
    z = cam[..., 2]
    zsafe = jnp.maximum(z, _Z_EPS)
    u = intr.fx * cam[..., 0] / zsafe + intr.cx
    v = intr.fy * cam[..., 1] / zsafe + intr.cy
    front = z > _Z_EPS
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(front, u, big), axis=1)
    umax = jnp.max(jnp.where(front, u, -big), axis=1)
    vmin = jnp.min(jnp.where(front, v, big), axis=1)
    vmax = jnp.max(jnp.where(front, v, -big), axis=1)
    all_front = jnp.all(front, axis=1)

    need = jnp.maximum((umax - umin) / plan.col_threshold,
                       (vmax - vmin) / plan.row_threshold)
    # ceil(log2(max(need, 1))) via power-of-two comparisons: exact integer
    # arithmetic on exact constants — bit-identical between this XLA form
    # and the Pallas meta kernel (pallas_kernels.block_meta), where a
    # library log2's last-ulp behavior could otherwise flip a level.
    lvl = jnp.zeros(need.shape, jnp.int32)
    for l in range(plan.full_level):
        lvl = lvl + (need > jnp.float32(1 << l)).astype(jnp.int32)
    # bbox-origin placement is only containment-safe when the bbox truly
    # fits the window at the chosen level; an all-front block hugging the
    # camera plane can need more than the full level provides — it takes
    # the whole-image fallback (origin 0 at full_level, where the entire
    # image fits the window by make_plan's construction), same as blocks
    # with corners behind the camera.
    bbox_ok = all_front & (need <= jnp.float32(1 << plan.full_level))
    lvl = jnp.where(bbox_ok, lvl, plan.full_level)

    _, _, offsets = mip_ops.level_tables(plan)
    off_l = offsets[lvl]
    vmin_l = jnp.where(bbox_ok,
                       (jnp.floor(vmin).astype(jnp.int32) >> lvl) - 1, 0)
    umin_l = jnp.where(bbox_ok,
                       (jnp.floor(umin).astype(jnp.int32) >> lvl) - 1, 0)
    v0 = jnp.clip(jnp.floor_divide(vmin_l, 8) * 8, 0,
                  plan.atlas_height - plan.row_window)
    u0a = jnp.clip(jnp.floor_divide(off_l + umin_l, 128) * 128, 0,
                   plan.atlas_width - plan.col_window)
    return lvl, u0a - off_l, v0, u0a


def extract_patches(atlas: jnp.ndarray, u0_atlas: jnp.ndarray,
                    v0: jnp.ndarray, plan: mip_ops.MipPlan) -> jnp.ndarray:
    """(C, AH, AW) atlas -> (K, C, rows, cols) patches (vmapped
    dynamic-slice: K slice-gathers, payload-sized rows — cheap, unlike
    per-element gathers). XLA reference path; the TPU kernel slices the
    VMEM-resident atlas directly."""
    C = atlas.shape[0]

    def one(v, u):
        return jax.lax.dynamic_slice(
            atlas, (0, v, u), (C, plan.row_window, plan.col_window))

    return jax.vmap(one)(v0, u0_atlas)


def extract_patches_multi(atlases: jnp.ndarray, frame_idx: jnp.ndarray,
                          u0_atlas: jnp.ndarray, v0: jnp.ndarray,
                          plan: mip_ops.MipPlan) -> jnp.ndarray:
    """(D, C, AH, AW) stacked atlases -> (K, C, rows, cols) patches, row j
    slicing atlas frame_idx[j] (mixed-frame row path)."""
    C = atlases.shape[1]

    def one(f, v, u):
        return jax.lax.dynamic_slice(
            atlases, (f, 0, v, u),
            (1, C, plan.row_window, plan.col_window))[0]

    return jax.vmap(one)(frame_idx, v0, u0_atlas)


def sample_patches(patches: jnp.ndarray, row: jnp.ndarray, col: jnp.ndarray,
                   mode: str) -> jnp.ndarray:
    """Per-voxel patch sampling: (K, C, rows, cols), (K, V3) -> (K, V3, C).

    mode "gather": XLA take_along_axis — exact, fast on CPU, serial on TPU.
    mode "onehot": two one-hot contractions on the MXU (XLA einsum form;
      superseded on TPU by the fused kernel, kept for tests/reference). The
      patch is split hi/lo into bf16 (exact to |x| * 2^-18 — integer
      channels <= 65535 and metric depth recover exactly after rounding).
    Out-of-window rows/cols sample 0 (gather: masked; onehot: all-zero
    one-hot) — masked upstream.
    """
    K, C, rows, cols = patches.shape
    if mode == "gather":
        inwin = ((row >= 0) & (row < rows) & (col >= 0) & (col < cols))
        idx = jnp.where(inwin, row * cols + col, 0)
        flat = patches.reshape(K, C, rows * cols)
        out = jnp.take_along_axis(flat, idx[:, None, :], axis=2)  # (K, C, V3)
        return jnp.where(inwin[:, None, :], out, 0.0).transpose(0, 2, 1)
    if mode != "onehot":
        raise ValueError(f"unknown sample mode: {mode}")
    hi = patches.astype(jnp.bfloat16)
    lo = (patches - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    p2 = jnp.concatenate([hi, lo], axis=1)                    # (K, 2C, r, c)
    ri = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows), 2)
    ci = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cols), 2)
    R = (row[:, :, None] == ri).astype(jnp.bfloat16)          # (K, V3, r)
    Cm = (col[:, :, None] == ci).astype(jnp.bfloat16)         # (K, V3, c)
    D = jnp.einsum("kvr,khrc->kvch", R, p2,
                   preferred_element_type=jnp.float32)
    val2 = jnp.einsum("kvch,kvc->kvh", D, Cm.astype(jnp.float32))
    return val2[..., :C] + val2[..., C:]                       # (K, V3, C)


def voxel_deltas(block_coords: jnp.ndarray, real_block: jnp.ndarray,
                 atlas: jnp.ndarray, T_G_C: jnp.ndarray, intr,
                 plan: mip_ops.MipPlan, cfg: FusionConfig, sample_mode: str,
                 region: str = "all"):
    """Dense per-voxel update contributions for K touched blocks (XLA
    reference path — semantically identical to the fused TPU kernel).

    Returns dict of deltas keyed like the grid channels:
      w (K, V3), wsdf (K, V3), cnt (K, V3), label (K, V3) int32,
      sem (K, L, V3), wcolor (K, 3, V3) [zeros unless ColorMode.COLOR].
    """
    K = block_coords.shape[0]
    return voxel_deltas_multi(
        jnp.zeros((K,), jnp.int32), block_coords, real_block, atlas[None],
        T_G_C[None], intr, plan, cfg, sample_mode, region=region)


def voxel_deltas_multi(frame_idx: jnp.ndarray, block_coords: jnp.ndarray,
                       real_block: jnp.ndarray, atlases: jnp.ndarray,
                       T_G_C_all: jnp.ndarray, intr, plan: mip_ops.MipPlan,
                       cfg: FusionConfig, sample_mode: str,
                       region: str = "all"):
    """voxel_deltas over a MIXED-frame row list: row j samples frame
    `frame_idx[j]`'s atlas with that frame's pose. Lets the sharded
    data-parallel step apply all D frames' owned rows through ONE combined
    row budget (slack paid once, not per frame — weak-scaling fix,
    VERDICT r1 item 2). atlases (D, C, AH, AW); T_G_C_all (D, 4, 4)."""
    from ..core import transforms

    g, t = cfg.grid, cfg.tsdf
    vps, V3, L = g.voxels_per_side, g.vps3, g.num_labels
    K = block_coords.shape[0]

    T_C_G_all = jax.vmap(transforms.inverse)(T_G_C_all)      # (D, 4, 4)
    Rk = T_C_G_all[frame_idx, :3, :3]                        # (K, 3, 3)
    tk = T_C_G_all[frame_idx, :3, 3]                         # (K, 3)
    lvl, u0l, v0, u0a = block_patch_meta_rows(block_coords, Rk, tk, intr,
                                              plan, g.block_size)
    patches = extract_patches_multi(atlases, frame_idx, u0a, v0, plan)

    # Voxel centers, SoA (K, V3) per component.
    lin = jnp.arange(V3, dtype=jnp.int32)
    lx, ly, lz = lin // (vps * vps), (lin // vps) % vps, lin % vps
    vs = jnp.float32(g.voxel_size)
    cx = ((block_coords[:, 0:1] * vps + lx[None]).astype(jnp.float32)
          + 0.5) * vs
    cy = ((block_coords[:, 1:2] * vps + ly[None]).astype(jnp.float32)
          + 0.5) * vs
    cz = ((block_coords[:, 2:3] * vps + lz[None]).astype(jnp.float32)
          + 0.5) * vs

    # World -> camera (unrolled 3x4 with per-row coefficients — SoA planes
    # stay in lanes).
    c = lambda i, j: Rk[:, i, j:j + 1]
    pX = c(0, 0) * cx + c(0, 1) * cy + c(0, 2) * cz + tk[:, 0:1]
    pY = c(1, 0) * cx + c(1, 1) * cy + c(1, 2) * cz + tk[:, 1:2]
    pZ = c(2, 0) * cx + c(2, 1) * cy + c(2, 2) * cz + tk[:, 2:3]
    zok = pZ > _Z_EPS
    zsafe = jnp.maximum(pZ, _Z_EPS)
    u = intr.fx * pX / zsafe + intr.cx
    v = intr.fy * pY / zsafe + intr.cy
    ui = jnp.floor(u + 0.5).astype(jnp.int32)                   # nearest pixel
    vi = jnp.floor(v + 0.5).astype(jnp.int32)
    in_img = (zok & (ui >= 0) & (ui < plan.width) & (vi >= 0)
              & (vi < plan.height))
    ui_c = jnp.clip(ui, 0, plan.width - 1)
    vi_c = jnp.clip(vi, 0, plan.height - 1)
    ul, vl = ui_c >> lvl[:, None], vi_c >> lvl[:, None]
    lvl_ok = ((ul < (plan.width >> lvl[:, None]))
              & (vl < (plan.height >> lvl[:, None])))
    row = vl - v0[:, None]
    col = ul - u0l[:, None]

    s = sample_patches(patches, row, col, sample_mode)           # (K, V3, 4)
    depth = s[..., 0]
    label = jnp.round(s[..., 1]).astype(jnp.int32)

    w, w_sdf, cnt, upd, color_gate = update_terms_from_sample(
        depth, label, pX, pY, pZ, zsafe, in_img & lvl_ok,
        real_block[:, None], cfg, region=region)

    lk = _likelihood(cfg)
    lab_iota = jax.lax.broadcasted_iota(jnp.int32, (1, L, 1), 1)
    inform = cnt > 0
    sem = jnp.where((label[:, None, :] == lab_iota) & inform[:, None, :],
                    jnp.float32(lk.delta), 0.0)                  # (K, L, V3)

    if cfg.semantic.color_mode == ColorMode.COLOR:
        rgb = mip_ops.unpack_color(s[..., 2], s[..., 3])         # (K, V3, 3)
        wc = jnp.where(upd & color_gate, w, 0.0)
        wcolor = (wc[:, :, None] * rgb).transpose(0, 2, 1)       # (K, 3, V3)
    else:
        wcolor = jnp.zeros((K, 3, V3), jnp.float32)
    return {"w": w, "wsdf": w_sdf, "cnt": cnt, "label": label, "sem": sem,
            "wcolor": wcolor}


def update_terms_from_sample(depth, label, pX, pY, pZ, zsafe, sample_ok,
                             real, cfg: FusionConfig, region: str = "all"):
    """Shared per-voxel update math given the sampled (depth, label) and the
    voxel's camera coordinates — used by both the XLA path above and traced
    inside the fused Pallas kernel (identical semantics by construction).

    region: "all" (default) updates the full traversal extent; "carve"
    restricts to strictly-before-the-band free space (sdf > trunc, plus
    clearing rays' clipped extent) — the dense free-space half of the ray
    integrators' carve_mode == "projective", whose truncation band is
    covered exactly by per-ray band jobs (models/fast.py). At the seam both
    sides agree the update is (w, w*trunc), so the handoff only affects
    weight mass at one voxel ring, never the TSDF value.

    Returns (w, w_sdf, cnt, upd, color_gate); w/w_sdf/cnt are masked to 0
    outside `upd`.
    """
    t, g = cfg.tsdf, cfg.grid
    depth_ok = (depth > 0.0) & (depth < mip_ops.DEPTH_SENTINEL * 0.5)

    # Surface point along the voxel's own camera ray (P = p_C * depth/z_v):
    # |P| = |p_C| * depth / z_v; sdf along the ray = |P| - |p_C|
    # (voxblox computeDistance with the voxel center exactly on the ray).
    t_v = jnp.sqrt(pX * pX + pY * pY + pZ * pZ)
    ray_norm = t_v * depth / zsafe
    sdf = ray_norm - t_v

    # voxblox isPointValid on the surface point (ops/tsdf.py point_validity).
    finite = depth_ok & sample_ok
    too_close = ray_norm < t.min_ray_length_m
    beyond = ray_norm > t.max_ray_length_m
    clearing = beyond & t.allow_clear
    pvalid = finite & ~too_close & (~beyond | t.allow_clear)
    pvalid &= sem_ops.dynamic_label_mask(label, cfg.semantic)
    pvalid &= real

    # Traversal-extent masks (ops/raycast.py setup_rays semantics).
    trunc = jnp.float32(t.truncation_distance)
    vs = jnp.float32(g.voxel_size)
    if t.voxel_carving_enabled:
        normal_band = sdf >= -trunc
    else:
        normal_band = jnp.abs(sdf) <= trunc
    clear_len = jnp.clip(ray_norm - trunc, 0.0, t.max_ray_length_m)
    if t.voxel_carving_enabled:
        clear_band = t_v <= clear_len
    else:
        clear_band = jnp.abs(t_v - clear_len) <= 0.5 * vs
    # (logical ops, not where-on-bools: Mosaic lacks i1 select)
    upd = pvalid & ((clearing & clear_band) | (~clearing & normal_band))
    if region == "carve":
        # Free space strictly before the truncation band; the band itself
        # ([dist-trunc, dist+trunc] along the ray) belongs to the per-ray
        # band jobs. Clearing rays are all free space — keep them whole.
        upd = upd & (clearing | (sdf > trunc))
    elif region != "all":
        raise ValueError(f"unknown update region {region!r}")

    # voxblox getVoxelWeight uses the point's camera z == sampled depth.
    if t.use_const_weight:
        w_point = jnp.ones_like(depth)
    else:
        w_point = jnp.where(depth > 1e-6,
                            1.0 / jnp.maximum(depth * depth, 1e-12), 0.0)
    w, w_sdf, color_gate = tsdf_ops.update_terms(sdf, w_point, t,
                                                 g.voxel_size)
    w = jnp.where(upd, w, 0.0)
    w_sdf = jnp.where(upd, w_sdf, 0.0)
    sem_upd = upd
    if cfg.semantic.update_near_surface_only:
        # Opt-in near-surface semantic gate (SemanticConfig docstring):
        # votes only inside the truncation band (color_gate = |sdf| < trunc).
        sem_upd = upd & color_gate
    cnt = jnp.where(sem_upd & sem_ops.informative(label), 1.0, 0.0)
    return w, w_sdf, cnt, upd, color_gate


def _likelihood(cfg: FusionConfig):
    from .integrate import make_likelihood_cached
    return make_likelihood_cached(cfg)
