"""Sorted segment-reduction scatter — the contention-free update path.

XLA lowers scatter-add with duplicate indices conservatively on some backends
(serialized updates). This module provides the sort-based alternative
(SURVEY 7 hard part c): sort the update stream by flat voxel key (+label),
segment-sum via cumsum differences at segment boundaries, then a single
unique-and-sorted-indices scatter per channel — O(N log N) with full vector
parallelism, no atomics, no serialization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


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
