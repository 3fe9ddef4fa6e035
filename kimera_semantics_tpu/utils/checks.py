"""Runtime invariant validation — the glog CHECK/DCHECK contract surface.

The reference has no unit tests; its quality gate is dense runtime checks
(SURVEY §4.1): likelihood row/col sums (semantic_integrator_base.cpp:113-121),
normalized-posterior checks (:345-348), stream-lockstep checks
(kimera_semantics_rosbag.cpp:74-77). Under jit, per-element Python asserts
are impossible, so the equivalent here is a host-side validator that audits a
whole grid snapshot at once — cheap enough to run at mesh/checkpoint
boundaries or in tests, exhaustive over every voxel.

`validate_grid` raises InvariantError with the first violated contract.
"""

from __future__ import annotations

import numpy as np

from ..config import FusionConfig
from ..grid import hash as bhash
from ..grid.blocks import VoxelGrid
from ..ops import semantic


class InvariantError(AssertionError):
    pass


def _check(ok: bool, msg: str):
    if not ok:
        raise InvariantError(msg)


def validate_grid(grid: VoxelGrid, cfg: FusionConfig) -> dict:
    """Audit hash-table and voxel-channel invariants; returns summary stats.

    Contracts checked (reference analogue in parentheses):
      H1  n_blocks within [0, capacity]; overflow >= 0 (fixed-capacity)
      H2  every table entry with a slot has a valid key and vice versa
      H3  slot ids are unique and < n_blocks
      H4  table lookup of every allocated block's coords returns its slot
          (allocateStorageAndGetVoxelPtr round-trip)
      V1  all accumulator channels finite (DCHECK(!hasNaN()))
      V2  wsum >= 0; sem_count >= 0 (weights/frequencies are sums of
          non-negatives, semantic_integrator_base.cpp:299-301)
      V3  |wsdf| <= wsum * truncation (per-measurement sdf clamped to the
          truncation band before accumulation — grid/blocks.py contract)
      V4  sem_delta >= 0, and sem_delta <= sem_count * (log p - log(1-p))
          per label (each vote adds exactly one count and one delta)
      V5  rows at/after the trash tile carry no *accounted* state: the trash
          rows are garbage by contract but must never be read — verified by
          checking allocated-slot coverage instead (H3/H4)
      P1  normalize_probabilities of the log-odds yields unit-L2 label
          vectors (the reference's Eigen .norm() normalization and its
          CHECK, :345-348) on a sample of voxels
    """
    g = cfg.grid
    cap = g.block_capacity
    nb = int(grid.n_blocks)
    _check(0 <= nb <= cap, f"H1: n_blocks {nb} outside [0, {cap}]")
    _check(int(grid.overflow) >= 0, "H1: negative overflow")
    _check(int(grid.dropped_rays) >= 0, "H1: negative dropped_rays")

    tk = np.asarray(grid.table_keys)
    ts = np.asarray(grid.table_slots)
    has_slot = ts >= 0
    vacant = (tk == bhash.EMPTY_KEY) | (tk == bhash.TOMBSTONE_KEY)
    _check(bool(np.all(~vacant[has_slot])),
           "H2: slot assigned to an empty/tombstone table key")
    _check(bool(np.all(has_slot[~vacant])),
           "H2: claimed key without a slot (post-rollback residue)")
    slots = ts[has_slot]
    _check(len(np.unique(slots)) == len(slots), "H3: duplicate slot ids")
    _check(bool(np.all((slots >= 0) & (slots < nb))),
           f"H3: slot id outside [0, n_blocks={nb})")
    _check(len(slots) == nb, f"H3: {len(slots)} table slots != n_blocks {nb}")

    if nb:
        import jax.numpy as jnp
        from ..grid import blocks as gblocks
        coords = np.asarray(grid.block_coords)[:nb]
        back = np.asarray(gblocks.lookup_slots(
            grid, jnp.asarray(coords, jnp.int32), g))
        _check(bool(np.all(back == np.arange(nb))),
               "H4: block_coords -> slot lookup round-trip failed")

    for name in ("wsum", "wsdf", "sem_count", "sem_delta", "wcolor"):
        arr = np.asarray(getattr(grid, name))
        live = arr[..., :nb, :] if arr.ndim == 2 else arr[:, :nb, :]
        _check(bool(np.isfinite(live).all()), f"V1: non-finite {name}")

    wsum = np.asarray(grid.wsum)[:nb]
    _check(bool((wsum >= 0).all()), "V2: negative wsum")
    semc = np.asarray(grid.sem_count)[:nb]
    _check(bool((semc >= 0).all()), "V2: negative sem_count")
    wsdf = np.asarray(grid.wsdf)[:nb]
    trunc = cfg.tsdf.truncation_distance
    _check(bool((np.abs(wsdf) <= wsum * trunc * (1 + 1e-5) + 1e-6).all()),
           "V3: |wsdf| exceeds wsum * truncation")

    lk = semantic.make_likelihood(cfg.semantic)
    sd = np.asarray(grid.sem_delta)[:, :nb]
    _check(bool((sd >= -1e-6).all()), "V4: negative sem_delta")
    _check(bool((sd <= semc[None] * lk.delta * (1 + 1e-5) + 1e-5).all()),
           "V4: sem_delta exceeds count * delta")

    if nb:
        import jax.numpy as jnp
        from ..grid import blocks as gblocks
        lo = gblocks.label_logodds(grid, lk.log_match, lk.log_nonmatch)
        sample = np.asarray(lo[:, :min(nb, 4)])          # (L, b, V3)
        lab_last = np.moveaxis(sample, 0, -1)            # (..., L)
        probs = np.asarray(semantic.normalize_probabilities(
            jnp.asarray(lab_last)))
        norms = np.linalg.norm(probs, axis=-1)
        _check(bool(np.allclose(norms, 1.0, atol=1e-4)),
               "P1: normalized posterior label vectors are not unit-norm")

    return {"n_blocks": nb, "overflow": int(grid.overflow),
            "dropped_rays": int(grid.dropped_rays),
            "observed_voxels": int((wsum > 0).sum()),
            "table_load": float(len(slots) / len(tk))}
