"""Mip-pyramid image atlas for the projective integrator.

The projective (voxel-centric) integrator samples the depth/label/color
images at each voxel's projected pixel. To bound the per-block image patch to
a fixed window (so patch extraction is a static dynamic-slice and the one-hot
MXU gather has static shapes), every block samples at the mip level at which
its projected bounding box fits in the window. This file builds that pyramid:

  - depth is MIN-pooled (conservative: the nearest surface wins, so coarse
    sampling can never carve free space *through* a closer surface);
  - label and color follow the argmin pixel (they describe the surviving
    surface, not an average across a depth discontinuity);
  - all levels are packed side by side into one (H, atlas_width) float32
    plane per channel, so a single dynamic-slice covers any (level, window)
    patch.

Window geometry is dictated by Mosaic's in-kernel dynamic-slice alignment
(ops/pallas_kernels.py projective_sample_update): row offsets must be
multiples of 8 and column offsets multiples of 128, so windows are
row_window x col_window (default 128 x 256) and the usable bbox thresholds
are (row_window - 9, col_window - 130) — the slack absorbs alignment.

Channels are encoded to survive the exact one-hot matmul gather: depth in
meters (invalid -> DEPTH_SENTINEL, finite so 0 * sentinel = 0 in the MXU
instead of NaN poisoning), label as a small integer, color as two channels
rg = r*256+g and b (both <= 65535, exactly recoverable through a bf16 hi/lo
split, unlike a single 24-bit packing).

The reference has no equivalent (its integrators are ray-centric); this is
the TPU-native mechanism behind the same capability surface
(kimera_semantics/src/semantic_tsdf_integrator_fast.cpp hot loops).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

DEPTH_SENTINEL = 1.0e6  # invalid-depth marker: large but finite (no NaN/Inf
                        # may enter the one-hot matmul sample path)


@dataclasses.dataclass(frozen=True)
class MipPlan:
    """Static geometry of the atlas (hashable; jit-static)."""

    height: int                  # level-0 image height
    width: int                   # level-0 image width
    row_window: int              # patch rows (sublane dim, offset mult of 8)
    col_window: int              # patch cols (lane dim, offset mult of 128)
    num_levels: int
    widths: Tuple[int, ...]      # per-level widths
    heights: Tuple[int, ...]
    offsets: Tuple[int, ...]     # per-level x offset in the atlas
    atlas_width: int             # padded to a lane multiple, >= col_window
    atlas_height: int            # >= row_window, multiple of 8
    full_level: int              # coarsest level: whole image fits the window

    @property
    def row_threshold(self) -> int:
        # -1 origin margin, -7 row alignment slack, -1 rounding
        return self.row_window - 9

    @property
    def col_threshold(self) -> int:
        # -1 origin margin, -127 column alignment slack, -2 rounding
        return self.col_window - 130


def make_plan(height: int, width: int, row_window: int = 128,
              col_window: int = 256) -> MipPlan:
    """Choose the level count so the coarsest level's full image fits the
    window even after alignment slack: any block, even one straddling the
    camera plane, can then always be sampled."""
    full_level = 0
    while (width >> full_level) > col_window - 127 or \
          (height >> full_level) > row_window - 7:
        full_level += 1
    num_levels = full_level + 1
    if (width % (1 << full_level)) or (height % (1 << full_level)):
        raise ValueError(
            f"image {width}x{height} not divisible by 2^{full_level}; "
            "pad the input or choose different windows")
    widths = tuple(width >> l for l in range(num_levels))
    heights = tuple(height >> l for l in range(num_levels))
    # 128-aligned level offsets: the per-level update-slice writes and the
    # kernel's patch slices then always land on lane-tile boundaries.
    offsets = []
    off = 0
    for l in range(num_levels):
        offsets.append(off)
        off += ((widths[l] + 127) // 128) * 128
    offsets = tuple(offsets)
    atlas_width = ((max(off, col_window) + 127) // 128) * 128
    atlas_height = ((max(height, row_window) + 7) // 8) * 8
    return MipPlan(height=height, width=width, row_window=row_window,
                   col_window=col_window, num_levels=num_levels,
                   widths=widths, heights=heights, offsets=offsets,
                   atlas_width=atlas_width, atlas_height=atlas_height,
                   full_level=full_level)


def _min_pool_with_payload(chans: jnp.ndarray) -> jnp.ndarray:
    """(C, h, w) -> (C, h/2, w/2); channel 0 (depth) min-pooled, the other
    channels follow the winning (argmin-depth) pixel.

    Even/odd extraction rides one-hot MXU contractions instead of strided
    slices: on TPU a lane-dim stride-2 slice is a serial shuffle and a
    sublane one a layout pass (~0.5 ms/frame measured for the 4-level
    pyramid), while these selection matmuls are ~20 us of MXU time. The
    package-wide HIGHEST matmul precision keeps the f32 payload exact
    through the dots (one-hot rows have a single active term)."""
    C, h, w = chans.shape
    wi = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 0)
    wj = jax.lax.broadcasted_iota(jnp.int32, (w, w // 2), 1)
    p_even = (wi == 2 * wj).astype(jnp.float32)          # (w, w/2)
    p_odd = (wi == 2 * wj + 1).astype(jnp.float32)
    a = jnp.einsum("chw,wj->chj", chans, p_even)
    b = jnp.einsum("chw,wj->chj", chans, p_odd)
    keep_a = a[0] <= b[0]
    x = jnp.where(keep_a[None], a, b)                    # (C, h, w/2)
    hi = jax.lax.broadcasted_iota(jnp.int32, (h // 2, h), 1)
    hj = jax.lax.broadcasted_iota(jnp.int32, (h // 2, h), 0)
    q_even = (hi == 2 * hj).astype(jnp.float32)          # (h/2, h)
    q_odd = (hi == 2 * hj + 1).astype(jnp.float32)
    a = jnp.einsum("jh,chw->cjw", q_even, x)
    b = jnp.einsum("jh,chw->cjw", q_odd, x)
    keep_a = a[0] <= b[0]
    return jnp.where(keep_a[None], a, b)


def build_atlas(depth: jnp.ndarray, labels: jnp.ndarray, colors: jnp.ndarray,
                plan: MipPlan) -> jnp.ndarray:
    """(H, W) depth/labels + (H, W, 3) colors -> (4, H, atlas_width) f32.

    Channel order: [depth, label, rg, b]."""
    d = jnp.where(jnp.isfinite(depth) & (depth > 0.0),
                  depth.astype(jnp.float32), DEPTH_SENTINEL)
    lab = labels.astype(jnp.float32)
    c = jnp.round(colors.astype(jnp.float32))
    rg = c[..., 0] * 256.0 + c[..., 1]
    chans = jnp.stack([d, lab, rg, c[..., 2]])                  # (4, H, W)
    atlas = jnp.zeros((4, plan.atlas_height, plan.atlas_width), jnp.float32)
    atlas = atlas.at[0].set(DEPTH_SENTINEL)
    level = chans
    for l in range(plan.num_levels):
        if l > 0:
            level = _min_pool_with_payload(level)
        atlas = atlas.at[:, : plan.heights[l],
                         plan.offsets[l]: plan.offsets[l] + plan.widths[l]
                         ].set(level)
    return atlas


# ---------------------------------------------------------------------------
# Wire codec for the sharded atlas exchange (r5, VERDICT item 2).
# ---------------------------------------------------------------------------

def wire_depth_max(cfg) -> float:
    """Fine-range bound for wire depth: max_ray + 2 x truncation.

    Any true depth >= this bound yields sdf >= truncation for every voxel
    a frame can legally update (z <= max_ray + trunc) — beyond it only the
    observation WEIGHT (1/depth^2 under use_const_weight=False) still
    depends on depth, so the codec keeps a coarse far segment instead of
    clipping (see wire_encode)."""
    return cfg.tsdf.max_ray_length_m + 2.0 * cfg.tsdf.truncation_distance


# Wire depth layout: codes [0, _WIRE_FINE_CODES) span [0, dmax] linearly
# (~0.09 mm step at the canonical 5.2 m range); codes
# [_WIRE_FINE_CODES, 65534] span (dmax, _WIRE_FAR_MAX] linearly (~17 mm
# step — the far depths only feed the 1/z^2 carve weight, where 17 mm is
# <0.2% relative error); 65535 = invalid sentinel. Depths beyond
# _WIRE_FAR_MAX clamp to it (weight error only, documented).
_WIRE_FINE_CODES = 60000.0
_WIRE_FAR_MAX = 100.0


def _wire_far_lo(cfg) -> float:
    return wire_depth_max(cfg)


def wire_encode(atlas, cfg):
    """Built f32 atlas -> compact u16/u8 wire planes for the ICI gather.

    The r4 sharded projective step all-gathered the full f32 mip atlas
    (~9.8 MB/frame — 86.6 MB/step at D=8, modeled no-overlap efficiency
    floor 0.53, SCALING_r04). The wire ships the WHOLE pyramid (encoding
    the built atlas, so decode is pure dequantization — rebuilding the
    pyramid after the gather would cost ~2.5 GFLOP of one-hot-MXU pooling
    PER REMOTE ATLAS, breaking the per-device work balance) at u16 depth
    + u8 label (u16 if num_labels > 256) + u16 rg / u8 b only in
    ColorMode.COLOR (semantic modes never read measured colors —
    render-time recoloring, ops/mesh.py): 3-6 bytes/px instead of 16.

    Returns a tuple of (AH, AW) planes: (d16, lab, [rg16, b8]).
    Labels/colors encode losslessly; depth quantizes at range/65534 with
    the invalid sentinel preserved."""
    from ..config import ColorMode
    dmax = wire_depth_max(cfg)
    d = atlas[0]
    valid = d < DEPTH_SENTINEL
    # Piecewise: fine range [0, dmax] (geometry-relevant; ~0.09 mm), coarse
    # far range (dmax, 100 m] (weight-relevant only; ~17 mm — the carve
    # weight is 1/depth^2, so clipping far depths to dmax would inflate
    # clearing weights up to (true/dmax)^2; review r5).
    far_hi = max(_WIRE_FAR_MAX, dmax * 2.0)
    q_fine = jnp.round(jnp.clip(d, 0.0, dmax)
                       * ((_WIRE_FINE_CODES - 1.0) / dmax))
    q_far = jnp.round((jnp.clip(d, dmax, far_hi) - dmax)
                      * ((65534.0 - _WIRE_FINE_CODES) / (far_hi - dmax))
                      ) + _WIRE_FINE_CODES
    q = jnp.where(d <= dmax, q_fine, q_far)
    d16 = jnp.where(valid, q, 65535.0).astype(jnp.uint16)
    ldt = jnp.uint8 if cfg.grid.num_labels <= 256 else jnp.uint16
    lab = jnp.clip(jnp.round(atlas[1]), 0, 65535).astype(ldt)
    planes = [d16, lab]
    if cfg.semantic.color_mode == ColorMode.COLOR:
        planes.append(jnp.clip(jnp.round(atlas[2]), 0,
                               65535).astype(jnp.uint16))
        planes.append(jnp.clip(jnp.round(atlas[3]), 0,
                               255).astype(jnp.uint8))
    return tuple(planes)


def atlas_from_wire(planes, cfg) -> jnp.ndarray:
    """Dequantize wire planes back to the (4, AH, AW) f32 atlas.

    Pure elementwise decode (no pyramid rebuild): a shard that decodes its
    own encoded atlas gets the identical atlas every other shard decodes,
    so the sharded step equals a single device integrating the
    wire-roundtripped atlases (the dryrun's quantized-exactness leg)."""
    dmax = wire_depth_max(cfg)
    far_hi = max(_WIRE_FAR_MAX, dmax * 2.0)
    d16 = planes[0].astype(jnp.float32)
    d_fine = d16 * (dmax / (_WIRE_FINE_CODES - 1.0))
    d_far = dmax + (d16 - _WIRE_FINE_CODES) * ((far_hi - dmax)
                                               / (65534.0 - _WIRE_FINE_CODES))
    d = jnp.where(d16 >= 65535.0, DEPTH_SENTINEL,
                  jnp.where(d16 < _WIRE_FINE_CODES, d_fine, d_far))
    lab = planes[1].astype(jnp.float32)
    if len(planes) > 2:
        rg = planes[2].astype(jnp.float32)
        b = planes[3].astype(jnp.float32)
    else:
        rg = jnp.zeros_like(d)
        b = jnp.zeros_like(d)
    return jnp.stack([d, lab, rg, b])


def wire_roundtrip_atlas(atlas, cfg) -> jnp.ndarray:
    """decode(encode(atlas)) — what every shard sees under the u16 wire
    protocol (test/dryrun single-device comparison helper)."""
    return atlas_from_wire(wire_encode(atlas, cfg), cfg)


def level_tables(plan: MipPlan):
    """Per-level (width, height, offset) as jnp arrays for traced-level
    indexing."""
    return (jnp.array(plan.widths, jnp.int32),
            jnp.array(plan.heights, jnp.int32),
            jnp.array(plan.offsets, jnp.int32))


def unpack_color(rg: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the rg/b channel packing -> (..., 3) float32 in [0, 255].

    The sampled rg may carry the bf16 hi/lo-split error (< 0.5 absolute, see
    ops/projective.py); rounding first makes the unpack exact."""
    rg = jnp.round(rg)
    r = jnp.floor(rg / 256.0)
    g = rg - r * 256.0
    return jnp.stack([r, g, jnp.round(b)], axis=-1)
