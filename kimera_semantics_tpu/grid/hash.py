"""Open-addressing block hash table: BlockIndex -> slot, fully jit-compatible.

TPU-native replacement for voxblox's `Layer<V>` spatial hash
(used via allocateStorageAndGetVoxelPtr, semantic_integrator_base.cpp:205-254).
Block coordinates are packed into a single int32 key (10 bits/axis, offset by
+world_extent_blocks), hashed with an xorshift-multiply mixer, and probed
linearly. Insertion is a batched, lock-free claim/verify loop: the XLA scatter
arbitrates races exactly where the reference used temp-block maps + mutexes
(semantic_integrator_base.cpp:205-265) — here allocation is a vectorized
pre-pass, so the update kernels never contend (SURVEY 2c).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

EMPTY_KEY = jnp.int32(-1)
# A claim rolled back by capacity overflow becomes a TOMBSTONE, not EMPTY:
# probe chains that wrapped past it must stay walkable (lookup keeps probing
# through tombstones, insert may re-claim them). Rolling back to EMPTY would
# punch a hole that makes later same-chain keys unreachable.
TOMBSTONE_KEY = jnp.int32(-2)
MAX_PROBES = 64


def pack_block_coords(coords: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Pack (..., 3) int32 block coords in [-extent, extent) into int32 keys."""
    c = coords + extent
    return (c[..., 0] << 20) | (c[..., 1] << 10) | c[..., 2]


def unpack_block_key(keys: jnp.ndarray, extent: int) -> jnp.ndarray:
    x = (keys >> 20) & 0x3FF
    y = (keys >> 10) & 0x3FF
    z = keys & 0x3FF
    return jnp.stack([x, y, z], axis=-1) - extent


def in_bounds(coords: jnp.ndarray, extent: int) -> jnp.ndarray:
    """(..., 3) -> (...,) bool; coords representable by the packed key."""
    return jnp.all((coords >= -extent) & (coords < extent), axis=-1)


def pack_block_coords_soa(bx: jnp.ndarray, by: jnp.ndarray, bz: jnp.ndarray,
                          extent: int) -> jnp.ndarray:
    """Component-wise variant of pack_block_coords (TPU-friendly SoA layout)."""
    return (((bx + extent) << 20) | ((by + extent) << 10) | (bz + extent))


def in_bounds_soa(bx, by, bz, extent: int) -> jnp.ndarray:
    ok = (bx >= -extent) & (bx < extent)
    ok &= (by >= -extent) & (by < extent)
    ok &= (bz >= -extent) & (bz < extent)
    return ok


def mix(keys: jnp.ndarray) -> jnp.ndarray:
    """32-bit finalizer (murmur3-style) producing well-spread positive hashes."""
    h = keys.astype(jnp.uint32)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h.astype(jnp.int32) & jnp.int32(0x7FFFFFFF)


@partial(jax.jit, static_argnames=("table_size",))
def lookup(table_keys: jnp.ndarray, table_slots: jnp.ndarray,
           keys: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Vectorized key -> slot lookup. Returns -1 for missing keys.

    Linear probing with a fixed probe budget; terminates early per-element on
    EMPTY (key cannot be further along the probe chain than the first hole).
    """
    mask = table_size - 1
    idx = mix(keys) & mask

    def cond(state):
        _, _, done, rounds = state
        return (~jnp.all(done)) & (rounds < MAX_PROBES)

    def body(state):
        idx, result, done, rounds = state
        k = table_keys[idx]
        hit = (k == keys) & ~done
        miss = (k == EMPTY_KEY) & ~done
        result = jnp.where(hit, table_slots[idx], result)
        done = done | hit | miss
        idx = jnp.where(done, idx, (idx + 1) & mask)
        return idx, result, done, rounds + 1

    _, result, _, _ = jax.lax.while_loop(
        cond, body,
        (idx, jnp.full_like(keys, -1), jnp.zeros(keys.shape, dtype=bool),
         jnp.int32(0)),
    )
    return result


@partial(jax.jit, static_argnames=("table_size", "capacity", "extent"))
def insert(table_keys: jnp.ndarray, table_slots: jnp.ndarray,
           block_coords: jnp.ndarray, n_blocks: jnp.ndarray,
           keys: jnp.ndarray, active: jnp.ndarray,
           table_size: int, capacity: int, extent: int):
    """Batch-insert packed block keys; allocate slots for new blocks.

    Args:
      table_keys/table_slots: (H,) current table state (slots -1 = unassigned).
      block_coords: (capacity, 3) slot -> block coord array to update.
      n_blocks: scalar int32 allocation counter.
      keys: (N,) packed keys to insert (duplicates fine).
      active: (N,) bool mask of keys to consider.

    Returns (table_keys, table_slots, block_coords, n_blocks, overflowed).
    Two phases: (1) claim table positions — a racing `.at[].set` followed by a
    verify-read, looping probes until every active key sits in the table;
    (2) assign slot ids to newly-claimed positions via a prefix-sum over the
    table. Keys that cannot be placed (table full) or slots beyond capacity are
    counted in `overflowed` (the fixed-capacity contract, SURVEY 7 hard part b).
    """
    mask = table_size - 1
    sentinel = jnp.int32(table_size)  # out-of-range scatter index == drop
    idx = mix(keys) & mask
    pending = active

    def cond(state):
        _, _, pending, rounds = state
        return jnp.any(pending) & (rounds < MAX_PROBES)

    def probe_round(state):
        table_keys, idx, pending, rounds = state
        k = table_keys[idx]
        placed = (k == keys) & pending
        pending = pending & ~placed
        is_empty = ((k == EMPTY_KEY) | (k == TOMBSTONE_KEY)) & pending
        # Racing claim: of colliding writers XLA keeps an arbitrary one.
        claim_idx = jnp.where(is_empty, idx, sentinel)
        table_keys = table_keys.at[claim_idx].set(keys, mode="drop")
        k2 = table_keys[idx]
        won = (k2 == keys) & pending
        pending = pending & ~won
        idx = jnp.where(pending, (idx + 1) & mask, idx)
        return table_keys, idx, pending, rounds + 1

    table_keys, idx, pending, _ = jax.lax.while_loop(
        cond, probe_round, (table_keys, idx, pending, jnp.int32(0)))

    # Phase 2: slot assignment for newly-claimed table positions.
    is_new = ((table_keys != EMPTY_KEY) & (table_keys != TOMBSTONE_KEY)
              & (table_slots < 0))
    order = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_slots = n_blocks + order
    fits = is_new & (new_slots < capacity)
    table_slots = jnp.where(fits, new_slots, table_slots)
    # Roll back claims whose slots didn't fit so lookups don't find key->-1;
    # TOMBSTONE (not EMPTY) keeps wrapped probe chains walkable.
    table_keys = jnp.where(is_new & ~fits, TOMBSTONE_KEY, table_keys)
    # Record slot -> block coords.
    coords = unpack_block_key(table_keys, extent)
    scatter_slot = jnp.where(fits, table_slots, capacity)
    block_coords = block_coords.at[scatter_slot].set(coords, mode="drop")
    n_new = jnp.sum(fits.astype(jnp.int32))
    slot_overflow = jnp.sum((is_new & ~fits).astype(jnp.int32))
    probe_overflow = jnp.sum(pending.astype(jnp.int32))
    return (table_keys, table_slots, block_coords, n_blocks + n_new,
            slot_overflow + probe_overflow)


@partial(jax.jit, static_argnames=("table_size", "capacity", "extent"))
def insert_compacted(table_keys: jnp.ndarray, table_slots: jnp.ndarray,
                     block_coords: jnp.ndarray, n_blocks: jnp.ndarray,
                     keys: jnp.ndarray, active: jnp.ndarray,
                     table_size: int, capacity: int, extent: int):
    """insert() after sort-compacting `keys` to its unique values.

    The claim/verify probe loop costs ~3 serial index ops per key per round
    (measured ~11 ns/index on TPU — grid/DESIGN cost model), so inserting a
    multi-hundred-k stream directly costs tens of ms while it contains only
    O(capacity) distinct blocks. Two cheap duplicate-heavy sorts compact the
    stream to <= capacity unique keys first; uniques beyond capacity are
    counted as overflow (they could never be allocated anyway).
    """
    import numpy as np
    trash = np.int32(0x7FFFFFFF)  # packed keys are 30-bit positive
    k = jnp.where(active, keys, trash)
    sk = jnp.sort(k)
    is_first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sk[1:] != sk[:-1]]) & (sk != trash)
    n_uniq = jnp.sum(is_first.astype(jnp.int32))
    uk = jnp.sort(jnp.where(is_first, sk, trash))[:capacity]
    dropped = jnp.maximum(0, n_uniq - capacity)
    tk, ts, bc, nb, ov = insert(table_keys, table_slots, block_coords,
                                n_blocks, uk, uk != trash, table_size,
                                capacity, extent)
    return tk, ts, bc, nb, ov + dropped


@partial(jax.jit, static_argnames=("budget",))
def unique_keys(keys: jnp.ndarray, active: jnp.ndarray, budget: int):
    """Compact a duplicate-heavy key stream to its unique values.

    Returns (uk (budget,) int32 ascending with trash==0x7FFFFFFF beyond the
    uniques, n_dropped). Used by the sharded projective path to shrink each
    frame's allocation candidates BEFORE the cross-shard all_gather (the raw
    (S, R) DDA planes are ~50x larger than their unique block set)."""
    import numpy as np
    trash = np.int32(0x7FFFFFFF)
    k = jnp.where(active.reshape(-1), keys.reshape(-1), trash)
    sk = jnp.sort(k)
    is_first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sk[1:] != sk[:-1]]) & (sk != trash)
    n_uniq = jnp.sum(is_first.astype(jnp.int32))
    uk = jnp.sort(jnp.where(is_first, sk, trash))[:budget]
    return uk, jnp.maximum(0, n_uniq - budget)


@partial(jax.jit, static_argnames=("table_size", "capacity", "extent",
                                   "budget"))
def insert_frame_list(table_keys: jnp.ndarray, table_slots: jnp.ndarray,
                      block_coords: jnp.ndarray, n_blocks: jnp.ndarray,
                      keys: jnp.ndarray, active: jnp.ndarray,
                      table_size: int, capacity: int, extent: int,
                      budget: int):
    """insert_compacted + this frame's touched-block list (projective path).

    Returns (table_keys, table_slots, block_coords, n_blocks, overflow,
    frame_coords (budget, 3) int32, frame_slots (budget,) int32,
    frame_real (budget,) bool).

    The list is GROUP-ALIGNED: it is partitioned into 8-row tiles, one per
    distinct slot-tile group (slot // 8) touched this frame, groups in
    ascending slot order; entry j covers slot group(j//8) * 8 + j % 8 —
    exactly the row layout of the grid channels' (8, 128) sublane tiles, so
    the Pallas apply kernel (ops/pallas_kernels.py block_rmw_add) does one
    aligned read-modify-write per tile group with no row placement.
    `frame_real[j]` marks rows whose slot is a block actually touched this
    frame; the other rows of a touched group are in-group padding (callers
    must emit zero deltas for them — the sample kernel's `real` gate).
    Tiles beyond the touched groups are trash tiles (slots capacity + j%8,
    the grid's trash rows). Touched blocks that do not fit `budget` rows are
    dropped and counted in overflow (their blocks may still be allocated and
    updated on a later frame)."""
    import numpy as np
    assert budget % 8 == 0 and capacity % 8 == 0
    trash = np.int32(0x7FFFFFFF)
    k = jnp.where(active, keys, trash)
    sk = jnp.sort(k)
    is_first = jnp.concatenate(
        [jnp.ones((1,), dtype=bool), sk[1:] != sk[:-1]]) & (sk != trash)
    n_uniq = jnp.sum(is_first.astype(jnp.int32))
    uk = jnp.sort(jnp.where(is_first, sk, trash))[:budget]
    dropped = jnp.maximum(0, n_uniq - budget)
    tk, ts, bc, nb, ov = insert(table_keys, table_slots, block_coords,
                                n_blocks, uk, uk != trash, table_size,
                                capacity, extent)
    slots_u = lookup(tk, ts, uk, table_size)
    real_u = (uk != trash) & (slots_u >= 0)
    # Sort touched slots ascending (non-real last), rank their tile groups.
    big = jnp.int32(1 << 30)
    s_sort = jnp.where(real_u, slots_u, big)
    order = jnp.argsort(s_sort)
    s = s_sort[order]
    coords_u = jnp.where(real_u[:, None],
                         unpack_block_key(uk, extent), 0)[order]
    isreal = s < big
    grp = s // 8
    newg = isreal & jnp.concatenate(
        [jnp.ones((1,), dtype=bool), grp[1:] != grp[:-1]])
    grank = jnp.cumsum(newg.astype(jnp.int32)) - 1
    pos = jnp.where(isreal, grank * 8 + s % 8, budget)
    group_overflow = jnp.sum((pos >= budget) & isreal)
    pos = jnp.minimum(pos, budget)  # >= budget -> dropped by mode="drop"
    n_tiles = budget // 8
    trash_group = capacity // 8
    tile_groups = jnp.full((n_tiles,), trash_group, jnp.int32)
    tile_groups = tile_groups.at[pos // 8].set(grp, mode="drop")
    row = jnp.arange(budget, dtype=jnp.int32) % 8
    fslots = jnp.repeat(tile_groups, 8) * 8 + row
    freal = jnp.zeros((budget,), dtype=bool).at[pos].set(isreal, mode="drop")
    fcoords = jnp.zeros((budget, 3), jnp.int32).at[pos].set(coords_u,
                                                            mode="drop")
    return (tk, ts, bc, nb, ov + dropped + group_overflow, fcoords, fslots,
            freal)
