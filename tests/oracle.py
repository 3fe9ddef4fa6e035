"""Sequential NumPy oracle implementing the reference's exact semantics.

This is an independent re-implementation (in NumPy, dict-based sparse voxels) of
the behaviors specified in SURVEY.md section 2: voxblox's RayCaster DDA,
projective TSDF update with per-measurement clamping, and Kimera-Semantics'
Bayesian log-odds label fusion (semantic_integrator_base.cpp:283-314). Tests
compare the JAX/TPU engine against this oracle within the tolerance contract.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import numpy as np

GRID_EPS = 1e-6


@dataclasses.dataclass
class OracleVoxel:
    distance: float = 0.0
    weight: float = 0.0
    color: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    logodds: np.ndarray | None = None
    label: int = 0


class OracleGrid:
    def __init__(self, voxel_size: float, num_labels: int = 21,
                 uniform_prior: float = -0.60205999132):
        self.voxel_size = voxel_size
        self.num_labels = num_labels
        self.uniform_prior = uniform_prior
        self.voxels: Dict[Tuple[int, int, int], OracleVoxel] = {}

    def get(self, idx) -> OracleVoxel:
        idx = tuple(int(i) for i in idx)
        if idx not in self.voxels:
            v = OracleVoxel()
            v.logodds = np.full(self.num_labels, self.uniform_prior, dtype=np.float64)
            v.color = np.zeros(3)
            self.voxels[idx] = v
        return self.voxels[idx]


def grid_index(point, voxel_size_inv):
    return tuple(int(math.floor(p * voxel_size_inv + GRID_EPS)) for p in point)


def raycast_voxels(origin, point_G, is_clearing, *, voxel_size, truncation,
                   max_ray_length, carving):
    """voxblox RayCaster: list of global voxel indices traversed.

    float32 arithmetic throughout — the reference's vxb::FloatingPoint is
    float, and DDA tie-breaking is precision-sensitive."""
    f32 = np.float32
    origin = np.asarray(origin, dtype=f32)
    point_G = np.asarray(point_G, dtype=f32)
    vec = point_G - origin
    norm = f32(np.sqrt(np.sum(vec * vec, dtype=f32)))
    if norm < 1e-12:
        return []
    unit = (vec / np.maximum(norm, f32(1e-12))).astype(f32)
    if is_clearing:
        length = f32(min(max(norm - f32(truncation), f32(0.0)),
                         f32(max_ray_length)))
        end = origin + unit * length
        start = origin if carving else end
    else:
        end = point_G + unit * f32(truncation)
        start = origin if carving else point_G - unit * f32(truncation)

    inv = f32(1.0 / voxel_size)
    start_s = (start * inv).astype(f32)
    end_s = (end * inv).astype(f32)
    curr = np.floor(start_s + f32(GRID_EPS)).astype(np.int64)
    end_i = np.floor(end_s + f32(GRID_EPS)).astype(np.int64)
    n_steps = int(np.abs(end_i - curr).sum())
    ray = (end_s - start_s).astype(f32)
    sign = np.sign(ray).astype(np.int64)
    corrected = np.maximum(sign, 0).astype(f32)
    with np.errstate(divide="ignore", invalid="ignore"):
        t_next = np.where(ray == 0, np.inf,
                          (corrected - (start_s - curr)) / ray).astype(f32)
        t_step = np.where(ray == 0, np.inf, sign / ray).astype(f32)
    out = []
    for _ in range(n_steps + 1):
        out.append(tuple(int(c) for c in curr))
        ax = int(np.argmin(t_next))
        curr[ax] += sign[ax]
        if np.isfinite(t_step[ax]):
            t_next[ax] += t_step[ax]
    return out


def integrate_rays(grid: OracleGrid, origin, points_G, weights, colors, labels,
                   is_clearing, valid, *, truncation, max_ray_length, carving,
                   use_weight_dropoff=True, log_match=None, log_nonmatch=None,
                   measurement_clamp=True, label_hists=None):
    """Sequential semantic TSDF integration over a ray batch.

    measurement_clamp=True follows the TPU engine's contract (clamp each
    measurement's sdf before averaging); False follows voxblox's
    clamp-after-update. Tests use both to bound the deviation.
    """
    origin = np.asarray(origin, dtype=np.float64)
    for r in range(len(points_G)):
        if not valid[r]:
            continue
        p = np.asarray(points_G[r], dtype=np.float64)
        voxels = raycast_voxels(origin, p, bool(is_clearing[r]),
                                voxel_size=grid.voxel_size, truncation=truncation,
                                max_ray_length=max_ray_length, carving=carving)
        v_point = p - origin
        dist_g = np.linalg.norm(v_point)
        for idx in voxels:
            vox = grid.get(idx)
            center = (np.array(idx, dtype=np.float64) + 0.5) * grid.voxel_size
            dist_gv = np.dot(center - origin, v_point) / max(dist_g, 1e-12)
            sdf = dist_g - dist_gv
            w = float(weights[r])
            if use_weight_dropoff:
                dropoff_eps = grid.voxel_size
                if sdf < -dropoff_eps:
                    w = max(w * (truncation + sdf) / (truncation - dropoff_eps), 0.0)
            if w <= 0.0:
                new_w = vox.weight
            else:
                new_w = vox.weight + w
                meas = np.clip(sdf, -truncation, truncation) if measurement_clamp else sdf
                new_d = (meas * w + vox.distance * vox.weight) / new_w
                if abs(sdf) < truncation:
                    vox.color = (vox.color * vox.weight + np.asarray(colors[r]) * w) / new_w
                vox.distance = float(np.clip(new_d, -truncation, truncation))
                vox.weight = new_w
            # Semantic update: every traversed voxel, regardless of weight
            # (updateSemanticVoxel is unconditional in _fast.cpp:124-140).
            if log_match is not None:
                if label_hists is not None:
                    # Merged integrator: full histogram (unknown col zeroed,
                    # _merged.cpp:254-328 with L from base.cpp:93-128).
                    hist = np.asarray(label_hists[r], dtype=np.float64).copy()
                    hist[0] = 0.0
                    vox.logodds += log_nonmatch * hist.sum()
                    vox.logodds += (log_match - log_nonmatch) * hist
                else:
                    lab = int(labels[r])
                    if lab != 0:
                        vox.logodds += log_nonmatch
                        vox.logodds[lab] += log_match - log_nonmatch
            vox.label = int(np.argmax(vox.logodds))
