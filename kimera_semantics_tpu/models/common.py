"""Shared frame-level plumbing for the integrators."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import FusionConfig
from ..core import camera as cam
from ..core.color import LabelColorMap
from ..ops import semantic as sem_ops
from ..ops import tsdf as tsdf_ops


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["depth", "labels", "colors", "T_G_C"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Frame:
    """One (depth, semantics, pose) input tuple.

    Equivalent payload to the reference's synchronized depth + semantic image +
    CameraInfo + TF (kimera_semantics_rosbag.cpp:78-145). `labels` are int32 ids;
    `colors` the per-pixel RGB used for voxel color blending. Either may be
    derived from the other via a LabelColorMap before construction.
    """

    depth: jnp.ndarray            # (H, W) float32 meters
    labels: jnp.ndarray           # (H, W) int32
    colors: jnp.ndarray           # (H, W, 3) float32 [0, 255]
    T_G_C: jnp.ndarray            # (4, 4) float32


def frame_from_images(depth, intr, label_map: Optional[LabelColorMap] = None,
                      labels=None, colors=None, T_G_C=None) -> Frame:
    """Build a Frame, deriving labels from colors (CSV map lookup — the
    reference's per-point color->label pass, _fast.cpp:150-158) or colors from
    labels (semantic recoloring) as needed."""
    import numpy as np
    del intr  # reserved for rescale handling
    if labels is None:
        if colors is None or label_map is None:
            raise ValueError("need labels, or colors + label_map")
        # Host arrays stay on the host LUT fast path (core/color.py) — the
        # ingestion thread must not dispatch per-frame device ops.
        if isinstance(colors, np.ndarray):
            labels = label_map.labels_from_colors(colors.astype(np.uint8))
        else:
            labels = label_map.labels_from_colors(
                jnp.asarray(colors).astype(jnp.uint8))
    if colors is None:
        if label_map is None:
            raise ValueError("need colors or label_map")
        if isinstance(labels, np.ndarray):
            colors = label_map.colors_from_labels(labels.astype(np.int32))
        else:
            colors = label_map.colors_from_labels(
                jnp.asarray(labels).astype(jnp.int32))
    labels = jnp.asarray(labels).astype(jnp.int32)
    colors = jnp.asarray(colors).astype(jnp.float32)
    if T_G_C is None:
        T_G_C = jnp.eye(4, dtype=jnp.float32)
    return Frame(depth=jnp.asarray(depth, dtype=jnp.float32), labels=labels,
                 colors=colors, T_G_C=jnp.asarray(T_G_C, dtype=jnp.float32))


def prepare_points(frame: Frame, intr: cam.PinholeIntrinsics, cfg: FusionConfig):
    """Backproject + validity + weights. Returns camera/world points and masks.

    Combines PointCloudFromDepth::convert (depth_map_to_pointcloud.h:213-275)
    with voxblox isPointValid / getVoxelWeight and the dynamic-label filter
    (semantic_tsdf_integrator_fast.cpp:75-77: invalid label skips the point
    entirely, TSDF included).
    """
    pts_C, px_valid = cam.backproject(frame.depth, intr)
    labels = frame.labels.reshape(-1)
    colors = frame.colors.reshape(-1, 3)
    valid, is_clearing = tsdf_ops.point_validity(pts_C, cfg.tsdf)
    valid = valid & px_valid & sem_ops.dynamic_label_mask(labels, cfg.semantic)
    weights = tsdf_ops.voxel_weight(pts_C, cfg.tsdf)
    from ..core import transforms
    pts_G = transforms.apply(frame.T_G_C, pts_C)
    origin = transforms.translation(frame.T_G_C)
    return pts_C, pts_G, origin, colors, labels, weights, valid, is_clearing


def gather_packed(idx: jnp.ndarray, *arrays):
    """Row-gather every array at `idx` via ONE packed gather.

    XLA TPU gathers execute serially at ~11-14 ns PER INDEX independent of
    payload width (docs/DESIGN.md cost model) — so K separate gathers of the
    same index set cost K x indices while one gather of the channel-packed
    matrix costs 1 x. int32 rides as a bitwise f32 cast (exact); bool as
    0/1. Returns the gathered arrays with original dtypes/ranks.
    """
    import jax as _jax
    cols, specs = [], []
    for a in arrays:
        a2 = a[:, None] if a.ndim == 1 else a
        if a2.dtype == jnp.int32:
            c = _jax.lax.bitcast_convert_type(a2, jnp.float32)
        elif a2.dtype == jnp.bool_:
            c = a2.astype(jnp.float32)
        elif a2.dtype == jnp.float32:
            c = a2
        else:
            raise TypeError(
                f"gather_packed: unsupported dtype {a2.dtype} (only float32/"
                "int32/bool round-trip exactly through the packed f32 gather)")
        specs.append((a.ndim, a.dtype, a2.shape[1]))
        cols.append(c)
    packed = jnp.concatenate(cols, axis=1)[idx]
    outs, off = [], 0
    for ndim, dt, w in specs:
        sl = packed[:, off:off + w]
        off += w
        if dt == jnp.int32:
            sl = _jax.lax.bitcast_convert_type(sl, jnp.int32)
        elif dt == jnp.bool_:
            sl = sl > 0.5
        outs.append(sl[:, 0] if ndim == 1 else sl)
    return tuple(outs)


def compact(order_mask: jnp.ndarray, max_out: int, *arrays):
    """Pack entries where order_mask is True into the first `max_out` slots.

    Static-shape compaction with the exact stable-argsort permutation, but
    one lax.sort operand instead of two: (drop flag, index) pack into a
    single int32 (flag in bit 30, index below — any N < 2^30), so ascending
    sort puts kept entries first in original order at ~half the argsort
    cost (r4, the prepare stage's dominant op at 307k pixels). Returns
    (kept_mask (max_out,), gathered arrays...). Entries beyond max_out are
    dropped (fixed ray budget, SURVEY 7).
    """
    from ..ops.reduce import stable_compact_order
    kept, order = stable_compact_order(order_mask, max_out)
    return (kept,) + gather_packed(order, *arrays)
