"""Scan-to-map pose refinement — the `enable_icp` capability, TPU-native.

Voxblox's TsdfServer can ICP-align each incoming cloud to the map before
integration (`enable_icp`, launch/kimera_semantics.launch:111; inherited
surface, SURVEY 2b). The reference runs a CPU point-to-plane ICP; the TPU-native
re-derivation aligns directly against the TSDF itself: minimize
    E(xi) = sum_i w_i * phi( exp(xi) * T0 * p_i )^2
where phi is the trilinearly interpolated map TSDF. Residual gradients flow
through the interpolation gathers by autodiff, and a damped Gauss-Newton step
solves the 6-dof twist — no correspondences, no kd-trees, fully batched.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..grid import blocks as gblocks
from ..grid.blocks import VoxelGrid


def sample_tsdf(grid: VoxelGrid, cfg: FusionConfig, points: jnp.ndarray):
    """Trilinear TSDF sample at world points (N, 3) -> (dist (N,), wmin (N,)).

    wmin is the minimum accumulated weight of the 8 support voxels — zero means
    the sample touches unobserved space and should be masked."""
    g = cfg.grid
    vps, v3, cap = g.voxels_per_side, g.vps3, g.block_capacity
    x = points / g.voxel_size - 0.5          # voxel-center lattice coords
    base = jnp.floor(x).astype(jnp.int32)
    frac = x - base

    dist = gblocks.tsdf_distance(grid, cfg.tsdf.truncation_distance)
    dist_flat = dist.reshape(-1)
    w_flat = grid.wsum.reshape(-1)

    out_d = jnp.zeros(points.shape[:-1], dtype=jnp.float32)
    out_w = jnp.full(points.shape[:-1], jnp.inf, dtype=jnp.float32)
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                corner = base + jnp.array([dx, dy, dz], dtype=jnp.int32)
                block, lin = gblocks.voxel_to_block_local(corner, vps)
                slots = gblocks.lookup_slots(grid, block, g)
                keys = slots * v3 + lin
                # Missing blocks resolve to the trash tile, which holds
                # GARBAGE on the Pallas RMW path (uninitialized buffers) —
                # read it as unobserved (weight 0) so out_w masks the sample.
                ok = slots < cap
                wgt = ((dx + (1 - 2 * dx) * (1 - frac[..., 0])) *
                       (dy + (1 - 2 * dy) * (1 - frac[..., 1])) *
                       (dz + (1 - 2 * dz) * (1 - frac[..., 2])))
                out_d = out_d + wgt * jnp.where(ok, dist_flat[keys], 0.0)
                out_w = jnp.minimum(out_w, jnp.where(ok, w_flat[keys], 0.0))
    return out_d, jnp.where(jnp.isfinite(out_w), out_w, 0.0)


def _exp_se3(xi: jnp.ndarray) -> jnp.ndarray:
    """Twist (6,) = (rot_vec, trans) -> (4, 4).

    Taylor-safe Rodrigues: R = I + A [w]x + B [w]x^2 with A = sin(t)/t and
    B = (1-cos t)/t^2 written as smooth functions of t^2 — the naive
    `w/|w|` form has NaN gradients at the zero twist, exactly where
    Gauss-Newton linearizes."""
    w = xi[:3]
    v = xi[3:]
    t2 = jnp.sum(w * w)
    small = t2 < 1e-8
    t2_safe = jnp.where(small, 1.0, t2)
    t = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(t)) / t2_safe)
    wx = jnp.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]],
                   dtype=xi.dtype)
    rot = jnp.eye(3, dtype=xi.dtype) + a * wx + b * (wx @ wx)
    top = jnp.concatenate([rot, v.reshape(3, 1)], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=xi.dtype)], axis=0)


@partial(jax.jit,
         static_argnames=("cfg", "iters", "refine_roll_pitch"))
def align_to_map(grid: VoxelGrid, cfg: FusionConfig, points_C: jnp.ndarray,
                 valid: jnp.ndarray, T_G_C: jnp.ndarray, iters: int = 6,
                 damping: float = 1e-3, refine_roll_pitch: bool = True,
                 min_match_ratio: float = 0.0):
    """Refine T_G_C so `points_C` agree with the map TSDF.

    Returns (T_refined (4,4), rms_residual (), match_ratio ()). Equivalent
    role to voxblox `ICP::runICP` inside processPointCloudMessageAndInsert;
    parameter surface mirrors voxblox's ICP config
    (launch/kimera_semantics.launch:111: iterations, refine_roll_pitch,
    subsampling is the caller's `points_C` stride).

    - `refine_roll_pitch=False` constrains the world-frame twist to yaw +
      translation (gravity-aligned platforms; voxblox icp_refine_roll_pitch).
    - `min_match_ratio`: if fewer than this fraction of the valid points land
      on observed, in-band TSDF, the refinement is rejected and T_G_C is
      returned unchanged (degenerate-geometry / poor-overlap guard)."""

    trunc = cfg.tsdf.truncation_distance
    # Constrained solve basis: columns of the world twist we optimize.
    # Twist layout is (w, v); w_x, w_y are roll/pitch about world axes
    # (xi is LEFT-applied: exp(xi) @ T, so w lives in the world frame).
    dof = (0, 1, 2, 3, 4, 5) if refine_roll_pitch else (2, 3, 4, 5)
    sel = jnp.asarray(dof)

    def residuals(xi, T):
        T_adj = _exp_se3(xi) @ T
        pts = points_C @ T_adj[:3, :3].T + T_adj[:3, 3]
        d, w = sample_tsdf(grid, cfg, pts)
        # Clamped samples sit on the truncation plateau: zero pull, but their
        # trilinear edges inject spurious gradients — gate them out.
        m = valid & (w > 1e-3) & (jnp.abs(d) < 0.9 * trunc)
        return jnp.where(m, d, 0.0), m

    def body(carry, _):
        T, _, _ = carry
        xi0 = jnp.zeros(6, dtype=jnp.float32)
        r, m = residuals(xi0, T)
        # Gauss-Newton: H = J^T J (the trilinear field's second derivatives
        # are noise across cell boundaries — full Newton diverges).
        jac = jax.jacfwd(lambda x: residuals(x, T)[0])(xi0)   # (N, 6)
        jac = jac[:, sel]                                     # (N, |dof|)
        grad = jac.T @ r
        hess = jac.T @ jac
        k = len(dof)
        hess = hess + damping * jnp.eye(k, dtype=hess.dtype) * (
            1.0 + jnp.trace(hess) / k)
        step_r = -jnp.linalg.solve(hess, grad)
        step = jnp.zeros(6, dtype=jnp.float32).at[sel].set(step_r)
        step = jnp.where(jnp.all(jnp.isfinite(step)), step,
                         jnp.zeros_like(step))
        # Trust region on the twist magnitude (half a voxel / ~3 degrees).
        cap_t = cfg.grid.voxel_size
        norm = jnp.linalg.norm(step) + 1e-12
        step = step * jnp.minimum(1.0, cap_t / norm)
        rms = jnp.sqrt(jnp.sum(r * r) / jnp.maximum(jnp.sum(m), 1))
        ratio = jnp.sum(m) / jnp.maximum(jnp.sum(valid), 1)
        return (_exp_se3(step) @ T, rms, ratio), None

    zero = jnp.float32(0.0)
    (T, rms, ratio), _ = jax.lax.scan(body, (T_G_C, zero, zero),
                                      jnp.arange(iters))
    ok = ratio >= min_match_ratio
    T = jnp.where(ok, T, T_G_C)
    return T, rms, ratio
