"""Semantic label <-> color maps.

TPU-native equivalent of `SemanticLabel2Color` (kimera_semantics/src/color.cpp:42-96)
plus voxblox's rainbow colormap (used by ColorMode::SEMANTIC_PROBABILITY,
semantic_integrator_base.cpp:183-188).

Design: instead of per-pixel hash-map lookups (the reference does a serial
std::unordered_map lookup per point, semantic_tsdf_integrator_fast.cpp:150-158),
colors are packed into 24-bit integer keys and mapped to labels with a sorted-array
binary search — one vectorized `searchsorted` over the whole image.
"""

from __future__ import annotations

import csv
import dataclasses
import io
import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import UNKNOWN_LABEL

# White is force-mapped to the unknown label 0 in both directions
# (reference color.cpp:62-66).
WHITE = (255, 255, 255)
GRAY = (128, 128, 128)


def pack_rgb(rgb: np.ndarray) -> np.ndarray:
    """Pack (..., 3) uint8 RGB into int32 keys (alpha intentionally ignored:
    the reference always looks colors up with a=255, _fast.cpp:155-157)."""
    keys = rgb[..., 0].astype(np.int32)
    keys <<= 8
    keys |= rgb[..., 1]
    keys <<= 8
    keys |= rgb[..., 2]
    return keys


@dataclasses.dataclass(frozen=True)
class LabelColorMap:
    """Bidirectional label<->color map as device-friendly arrays.

    - sorted_keys / sorted_labels: packed-RGB -> label (binary search)
    - label_colors: (256, 3) uint8, label -> RGB
    Unknown colors map to UNKNOWN_LABEL (color.cpp:69-82); unknown labels map to
    color (0, 0, 0) with alpha semantics dropped (color.cpp:85-96 returns a
    default-constructed color).
    """

    sorted_keys: np.ndarray      # (K,) int32
    sorted_labels: np.ndarray    # (K,) int32
    label_colors: np.ndarray     # (256, 3) uint8
    num_labels: int
    # Host-side decode LUT (2^24 uint8, packed RGB -> label), built lazily by
    # labels_from_colors' NumPy fast path. Ingestion decodes hundreds of
    # frames; one 16 MB table turns the per-pixel map into a single gather
    # instead of six dispatched jnp ops per frame (measured 55 -> 450+ fps
    # host decode). Cached per instance; not part of equality/hash.
    _host_lut: list = dataclasses.field(default_factory=list, compare=False,
                                        repr=False)

    @staticmethod
    def from_pairs(label_to_rgb: Dict[int, Tuple[int, int, int]],
                   rgb_to_label: Dict[Tuple[int, int, int], int],
                   num_labels: int) -> "LabelColorMap":
        label_to_rgb = dict(label_to_rgb)
        rgb_to_label = dict(rgb_to_label)
        # Force White <-> label 0 (color.cpp:62-66).
        label_to_rgb[UNKNOWN_LABEL] = WHITE
        rgb_to_label[WHITE] = UNKNOWN_LABEL
        keys = pack_rgb(np.array(list(rgb_to_label.keys()), dtype=np.uint8))
        labels = np.array(list(rgb_to_label.values()), dtype=np.int32)
        order = np.argsort(keys)
        colors = np.zeros((256, 3), dtype=np.uint8)
        for lab, rgb in label_to_rgb.items():
            colors[lab] = rgb
        return LabelColorMap(
            sorted_keys=keys[order].astype(np.int32),
            sorted_labels=labels[order],
            label_colors=colors,
            num_labels=num_labels,
        )

    @staticmethod
    def from_csv(path_or_text: str,
                 num_labels: Optional[int] = None) -> "LabelColorMap":
        """Load a `name,red,green,blue,alpha,id` CSV (reference color.cpp:47-56;
        see kimera_semantics_ros/cfg/*.csv). Later rows win on duplicate colors,
        matching std::unordered_map::operator[] overwrite semantics.

        num_labels defaults to max(21, max id + 1): CSVs with ids past the
        reference's compile-time 21 (e.g. goseek_scene1, max id 255) get a
        correspondingly larger runtime label space (common.h:24-26 fix).
        NB grid memory scales linearly in num_labels (sem_delta channel)."""
        if os.path.exists(path_or_text):
            with open(path_or_text, "r") as f:
                text = f.read()
        else:
            text = path_or_text
        label_to_rgb: Dict[int, Tuple[int, int, int]] = {}
        rgb_to_label: Dict[Tuple[int, int, int], int] = {}
        reader = csv.reader(io.StringIO(text))
        for row in reader:
            if not row or row[0].strip() == "name":
                continue
            if len(row) != 6:
                raise ValueError(f"Invalid label-map CSV row: {row}")
            r, g, b, _a, lab = (int(x) for x in row[1:6])
            label_to_rgb[lab] = (r, g, b)
            rgb_to_label[(r, g, b)] = lab
        if num_labels is None:
            # ids whose color is White are force-remapped to label 0 by
            # from_pairs (color.cpp:62-66) — they are unreachable in
            # color-decode mode, so don't let them inflate the label space
            # (goseek's 'Missing,255,255,255,255,255' row would otherwise
            # force a 256-wide — 12x memory — sem_delta channel).
            reachable = [lab for lab, rgb in label_to_rgb.items()
                         if rgb != WHITE]
            num_labels = max(21, max(reachable, default=0) + 1)
        return LabelColorMap.from_pairs(label_to_rgb, rgb_to_label, num_labels)

    @staticmethod
    def random(num_labels: int = 21, seed: int = 0) -> "LabelColorMap":
        """Equivalent of getRandomSemanticLabelToColorMap() (color.h:61-82):
        255 random colors with labels 0-7 pinned to distinguishable colors."""
        rng = np.random.RandomState(seed)
        colors = rng.randint(0, 256, size=(256, 3)).astype(np.uint8)
        pinned = [GRAY, (0, 255, 0), (0, 0, 255), (128, 0, 128),
                  (255, 192, 203), (0, 128, 128), (255, 165, 0), (255, 255, 0)]
        for i, c in enumerate(pinned):
            colors[i] = c
        # Ensure injectivity for roundtrip lookups.
        rgb_to_label = {}
        for lab in range(255, -1, -1):
            rgb_to_label[tuple(int(v) for v in colors[lab])] = lab
        label_to_rgb = {lab: tuple(int(v) for v in colors[lab]) for lab in range(256)}
        return LabelColorMap.from_pairs(label_to_rgb, rgb_to_label, num_labels)

    def labels_from_colors(self, rgb) -> jnp.ndarray:
        """Vectorized color -> label id. rgb: (..., 3) uint8. Unknown colors ->
        UNKNOWN_LABEL (without the reference's per-pixel LOG(ERROR), color.cpp:75-80).

        NumPy inputs take a host fast path (direct 2^24 LUT gather — ingestion
        is host-bound, see the class docstring); jax arrays/tracers keep the
        searchsorted form, jit-safe."""
        if isinstance(rgb, np.ndarray):
            lut = self._lut()
            keys = pack_rgb(rgb)
            return lut[keys].astype(np.int32)
        keys = (rgb[..., 0].astype(jnp.int32) << 16) | \
               (rgb[..., 1].astype(jnp.int32) << 8) | rgb[..., 2].astype(jnp.int32)
        table = jnp.asarray(self.sorted_keys)
        labs = jnp.asarray(self.sorted_labels)
        idx = jnp.searchsorted(table, keys)
        idx = jnp.clip(idx, 0, table.shape[0] - 1)
        hit = table[idx] == keys
        return jnp.where(hit, labs[idx], UNKNOWN_LABEL)

    def _lut(self) -> np.ndarray:
        if not self._host_lut:
            lut = np.full(1 << 24, UNKNOWN_LABEL, dtype=np.uint8)
            lut[self.sorted_keys] = self.sorted_labels.astype(np.uint8)
            self._host_lut.append(lut)
        return self._host_lut[0]

    def colors_from_labels(self, labels) -> jnp.ndarray:
        """Vectorized label -> RGB uint8 (color.cpp:85-96). NumPy in ->
        NumPy out (host path), jax in -> jax out."""
        if isinstance(labels, np.ndarray):
            # match the jnp gather exactly: negatives wrap once (Python
            # indexing), out-of-range clamps — clip to [-256, 255] gives the
            # identical composite on a 256-row table
            return self.label_colors[np.clip(labels, -256, 255)]
        return jnp.asarray(self.label_colors)[labels]


def rainbow_colormap(values: jnp.ndarray) -> jnp.ndarray:
    """voxblox `rainbowColorMap(h)` equivalent: h in [0,1] -> RGB uint8.

    Used for ColorMode.SEMANTIC_PROBABILITY (semantic_integrator_base.cpp:183-188).
    Follows voxblox's HSV-like 6-sector rainbow."""
    h = jnp.clip(values, 0.0, 1.0) * 5.9999
    i = jnp.floor(h).astype(jnp.int32)
    f = h - i
    f = jnp.where(i % 2 == 0, 1.0 - f, f)  # even sectors ramp down
    n = 1.0 - f
    zeros = jnp.zeros_like(n)
    ones = jnp.ones_like(n)
    # sector -> (r, g, b)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [ones, n, zeros, zeros, n, ones], ones)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [n, ones, ones, n, zeros, zeros], zeros)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [zeros, zeros, n, ones, ones, n], zeros)
    return (jnp.stack([r, g, b], axis=-1) * 255.0).astype(jnp.uint8)
