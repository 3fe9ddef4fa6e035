"""Sorted segment-reduction scatter — the contention-free update path.

XLA lowers scatter-add with duplicate indices conservatively on some backends
(serialized updates). This module provides the sort-based alternative
(SURVEY 7 hard part c): sort the update stream by flat voxel key (+label),
segment-sum via cumsum differences at segment boundaries, then a single
unique-and-sorted-indices scatter per channel — O(N log N) with full vector
parallelism, no atomics, no serialization.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def sorted_scatter_add(target_flat: jnp.ndarray, keys: jnp.ndarray,
                       values: jnp.ndarray, trash_key: int) -> jnp.ndarray:
    """target_flat (M[, C]) += segment-sums of values (N[, C]) grouped by
    keys (N,). Entries with key == trash_key are dropped. Standalone helper —
    for multiple channels over one key set prefer SortedUpdates."""
    su = SortedUpdates.build(keys, trash_key)
    return su.apply(target_flat, values)


class SortedUpdates:
    """One sort, many channels."""

    def __init__(self, order, sorted_keys, ends, out_keys, n_segments_mask):
        self.order = order
        self.sorted_keys = sorted_keys
        self.ends = ends                  # boundary positions (segment ends)
        self.out_keys = out_keys          # unique key per segment (trash-safe)
        self.mask = n_segments_mask       # bool per segment slot

    @staticmethod
    def build(keys: jnp.ndarray, trash_key: int,
              secondary: Optional[jnp.ndarray] = None) -> "SortedUpdates":
        n = keys.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        if secondary is None:
            sk, order = jax.lax.sort((keys, idx), num_keys=1)
            sec_sorted = None
        else:
            sk, sec_sorted, order = jax.lax.sort((keys, secondary, idx),
                                                 num_keys=2)
        # Segment end i: last position of a run of equal (key[, secondary]).
        neq = sk[:-1] != sk[1:]
        if sec_sorted is not None:
            neq = neq | (sec_sorted[:-1] != sec_sorted[1:])
        is_end = jnp.concatenate([neq, jnp.ones((1,), dtype=bool)])
        # Compact segment ends to the front (at most n segments).
        ends = jnp.where(is_end, idx, n)
        ends = jax.lax.sort(ends)                  # valid ends first? no: n's last
        seg_count = jnp.sum(is_end.astype(jnp.int32))
        slot = jnp.arange(n, dtype=jnp.int32)
        mask = (slot < seg_count) & (ends < n)
        safe_ends = jnp.minimum(ends, n - 1)
        out_keys = jnp.where(mask & (sk[safe_ends] != trash_key),
                             sk[safe_ends], -1)
        su = SortedUpdates(order, sk, safe_ends, out_keys, mask)
        su._sec_sorted = sec_sorted
        return su

    def segment_sums(self, values: jnp.ndarray) -> jnp.ndarray:
        """Per-segment sums of values (N[, C]) -> (N[, C]) at segment slots."""
        v = values[self.order]
        c = jnp.cumsum(v.astype(jnp.float32), axis=0)
        at_end = c[self.ends]
        prev = jnp.concatenate(
            [jnp.zeros_like(at_end[:1]),
             at_end[:-1]], axis=0)
        return jnp.where(self.mask.reshape((-1,) + (1,) * (v.ndim - 1)),
                         at_end - prev, 0.0)

    def apply(self, target_flat: jnp.ndarray, values: jnp.ndarray,
              out_index: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        sums = self.segment_sums(values)
        keys = self.out_keys if out_index is None else out_index
        # Invalid slots go to distinct out-of-range indices so the
        # unique_indices promise holds even for dropped entries.
        slot = jnp.arange(keys.shape[0], dtype=jnp.int32)
        safe = jnp.where(keys >= 0, keys, target_flat.shape[0] + slot)
        return target_flat.at[safe].add(sums, mode="drop", unique_indices=True)

    def secondary_at_segments(self) -> jnp.ndarray:
        """Sorted secondary key (e.g. label) of each segment."""
        return self._sec_sorted[self.ends]


# ---------------------------------------------------------------------------
# Sorted-segment compaction reduce — the TPU-measured fast path.
#
# Measured cost model on v5e (scripts/profile_scatter_model.py): XLA scatter
# and gather cost ~11-14 ns PER INDEX (serial scalar loop), independent of
# target size; lax.sort with <=4 operands costs ~22 ms at 5.9M entries when
# keys are duplicate-heavy (the voxel update stream has 10-300x duplication);
# elementwise passes are ~4 ms. So the winning reduction is: one sort, an
# exact segmented scan (vector passes only), one compaction sort, then
# scatters with only n_segments (~10-100k) indices.
#
# CAVEAT (measured, scripts/profile_sort_scan.py): lax.sort falls off a cliff
# (~200x) when keys are *mostly unique* at multi-million scale, and with >4
# operands. Voxel-update keys are heavily duplicated, so both sorts here stay
# on the fast path; callers with near-unique keys should use "direct".
# ---------------------------------------------------------------------------

# numpy scalar, NOT a jnp array: device-array constants captured under an
# outer jit can deadlock this JAX build's lowering (_value fetch race);
# numpy constants are embedded directly.
TRASH_KEY = np.int32(0x7FFFFFFF)


def stable_compact_order(keep_mask: jnp.ndarray, max_out: int):
    """Stable compaction permutation: (kept (max_out,), order (max_out,)).

    `order` holds the positions of keep_mask's True entries first, in
    original order (then dropped positions); `kept` flags which output
    slots are real. Shared by models/common.py compact, ops/carve.py
    compact_jobs and ops/mesh.py _compact_tris (review r5 — one home for
    the lax.sort-cliff workaround): below ~500k entries a packed
    single-operand key (flag in bit 30) sorts at ~half the 2-operand
    cost; above it the all-unique packed key hits lax.sort's
    mostly-unique cliff (~200x, CLAUDE.md) and the stable 2-operand sort
    on the BINARY flag is the fast form."""
    n = keep_mask.shape[0]
    assert n < (1 << 30), "compaction needs index + flag to fit int32"
    iota = jnp.arange(n, dtype=jnp.int32)
    if n <= 500_000:
        packed = jnp.where(keep_mask, iota, iota | jnp.int32(1 << 30))
        sk = jax.lax.sort(packed)[:max_out]
        return sk < jnp.int32(1 << 30), sk & jnp.int32((1 << 30) - 1)
    flag = (~keep_mask).astype(jnp.int32)
    sflag, order = jax.lax.sort((flag, iota), num_keys=1)
    return sflag[:max_out] == 0, order[:max_out]


def segmented_scan_sums(is_start: jnp.ndarray, channels,
                        max_run: int | None = None):
    """Exact inclusive segmented prefix-sum (Hillis-Steele with flags).

    channels: tuple of (N,) float arrays, summed within segments delimited by
    `is_start` (bool (N,), True at each segment's first element). Returns the
    per-position inclusive segment prefix for each channel — position i of a
    segment holds the sum of its segment's elements up to i. Additions only
    ever combine values from the same segment, so precision is that of a
    (log-depth) tree sum of the segment — no global-cumsum cancellation.

    max_run bounds the longest segment whose sum must be exact; levels stop
    once the doubling window covers it (callers: a sorted voxel-update stream
    has at most one entry per ray per voxel, so max_run = the ray count —
    cuts ~1/3 of the levels, and level count dominates both compile time and
    runtime of the unrolled graph). Segments longer than max_run yield
    partial sums — only acceptable for trash segments that are discarded.
    """
    n = int(is_start.shape[0])
    limit = n if max_run is None else min(n, max_run)
    s_list = list(channels)
    f = is_start
    d = 1
    while d < limit:
        f_shift = jnp.concatenate(
            [np.ones((d,), dtype=bool), f[:-d]])
        for j, s in enumerate(s_list):
            s_shift = jnp.concatenate(
                [np.zeros((d,), dtype=s.dtype), s[:-d]])
            s_list[j] = jnp.where(f, s, s + s_shift)
        f = f | f_shift
        d *= 2
    return tuple(s_list)


def segment_compact_reduce(keys: jnp.ndarray, channels, budget: int,
                           max_run: int | None = None,
                           active_frac: float | None = None):
    """Group-reduce an update stream by key and compact to a static budget.

    keys: (N,) int32, trash entries == TRASH_KEY (their channel values MUST be
    zero). channels: tuple of up to 3 (N,) f32 arrays (lax.sort 4-operand
    limit — see cliff note above). max_run: optional bound on the largest
    real segment (see segmented_scan_sums) — trash may exceed it freely.

    Returns (out_keys (budget,), out_sums tuple of (budget,), n_dropped):
    out_keys are the unique keys sorted ascending (TRASH_KEY beyond
    n_segments), out_sums their per-key channel totals, n_dropped the number
    of real segments that did not fit in `budget` (caller should account
    these as overflow).
    """
    assert len(channels) <= 3, "lax.sort >4 operands hits the slow path"
    sorted_ = jax.lax.sort((keys,) + tuple(channels), num_keys=1)
    sk, sch = sorted_[0], sorted_[1:]
    pre_drop = jnp.int32(0)
    if active_frac is not None and active_frac < 1.0:
        # Trash sorts to the end (TRASH_KEY = int32 max); padded update
        # streams are typically ~50% trash, so slice it off and run the scan
        # and compaction sort on the active prefix only. Real entries beyond
        # the slice (streams denser than active_frac) are dropped and
        # counted — same static-budget contract as `budget` itself.
        n_keep = int(math.ceil(active_frac * sk.shape[0]))
        n_act = jnp.sum((keys != TRASH_KEY).astype(jnp.int32))
        pre_drop = jnp.maximum(0, n_act - n_keep)
        sk = sk[:n_keep]
        sch = tuple(c[:n_keep] for c in sch)
    n = int(sk.shape[0])
    neq = sk[1:] != sk[:-1]
    is_start = jnp.concatenate([jnp.ones((1,), dtype=bool), neq])
    is_end = jnp.concatenate([neq, jnp.ones((1,), dtype=bool)])
    scans = segmented_scan_sums(is_start, sch, max_run=max_run)
    valid_end = is_end & (sk != TRASH_KEY)
    ck = jnp.where(valid_end, sk, TRASH_KEY)
    out = jax.lax.sort((ck,) + tuple(scans), num_keys=1)
    out_keys = out[0][:budget]
    out_sums = tuple(o[:budget] for o in out[1:])
    n_seg = jnp.sum(valid_end.astype(jnp.int32))
    n_dropped = jnp.maximum(0, n_seg - budget) + pre_drop
    return out_keys, out_sums, n_dropped
