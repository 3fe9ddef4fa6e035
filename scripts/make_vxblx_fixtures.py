#!/usr/bin/env python
"""Generate protobuf ground-truth fixtures for the .vxblx reader
(VERDICT r3 weak #6 / item 8).

The repo's io/vxblx.py was previously pinned only against bytes its own
writer produced — self-referential. These fixtures are assembled by an
INDEPENDENT encoder written directly from the proto2 wire-format spec
(https://protobuf.dev/programming-guides/encoding/) and the voxblox
Layer.proto/Block.proto schemas (double voxel_size = 1; uint32
voxels_per_side = 2; string type = 3 / double origin_{x,y,z} = 3,4,5;
bool has_data = 6; repeated uint32 voxel_data = 7), matching what C++
protobuf emits for voxblox's SaveLayer stream framing
(utils/protobuf_utils.h: varint message count, then varint-delimited
messages). Edge cases covered:

  tsdf_unpacked.vxblx   unpacked `repeated uint32` (proto2 default without
                        [packed=true] — what voxblox's C++ writer emits),
                        5-byte varints (f32 bit patterns >= 2^28), >127-byte
                        message lengths (2-byte length varints).
  tsdf_packed.vxblx     the SAME logical layer with packed encoding — and
                        with the packed payload of block 0 SPLIT into two
                        length-delimited chunks (legal per spec: a packed
                        repeated field may appear multiple times; decoders
                        must concatenate).
  many_blocks.vxblx     151 messages -> a 2-byte message-count varint
                        (count = 0x97, 0x01), tiny headers-only blocks.

Deterministic content: run this script to regenerate byte-identical files.
"""

import os
import struct

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


# -- independent proto2 primitives (from the spec, not io/vxblx.py) ---------

def varint(v):
    out = bytearray()
    while True:
        if v > 0x7F:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        else:
            out.append(v)
            return bytes(out)


def key(field, wire_type):
    return varint((field << 3) | wire_type)


def f_double(field, val):
    return key(field, 1) + struct.pack("<d", val)


def f_varint(field, val):
    return key(field, 0) + varint(val)


def f_len(field, payload):
    return key(field, 2) + varint(len(payload)) + payload


def layer_header(voxel_size, vps, ltype):
    return (f_double(1, voxel_size) + f_varint(2, vps)
            + f_len(3, ltype.encode()))


def block_fields(voxel_size, vps, origin):
    return (f_double(1, voxel_size) + f_varint(2, vps)
            + f_double(3, origin[0]) + f_double(4, origin[1])
            + f_double(5, origin[2]) + f_varint(6, 1))


def stream(messages):
    """voxblox SaveLayer framing: message count, then delimited messages."""
    out = bytearray(varint(len(messages)))
    for m in messages:
        out += varint(len(m)) + m
    return bytes(out)


# -- deterministic voxel content --------------------------------------------

def tsdf_words(vps, seed):
    """(vps^3, 3) uint32 words: f32 distance bits, f32 weight bits, packed
    rgba. Values chosen to exercise 1..5-byte varints."""
    n = vps ** 3
    rng = np.random.RandomState(seed)
    dist = (rng.rand(n).astype(np.float32) * 0.4 - 0.2)
    weight = rng.randint(0, 5, n).astype(np.float32) * 2.5
    dist = np.where(weight > 0, dist, 0.0).astype(np.float32)
    r = rng.randint(0, 256, n, dtype=np.uint32)
    g = rng.randint(0, 256, n, dtype=np.uint32)
    b = rng.randint(0, 256, n, dtype=np.uint32)
    a = np.where(weight > 0, 255, 0).astype(np.uint32)
    color = (r << 24) | (g << 16) | (b << 8) | a
    return np.stack([dist.view(np.uint32), weight.view(np.uint32), color],
                    axis=-1)


def main():
    vps = 8
    vs = 0.1
    os.makedirs(OUT, exist_ok=True)
    blocks = [((0.0, 0.0, 0.0), tsdf_words(vps, 1)),
              ((0.8, -0.8, 1.6), tsdf_words(vps, 2))]

    # 1) unpacked: one (tag, varint) pair per word — C++ proto2 default.
    msgs = [layer_header(vs, vps, "tsdf")]
    for origin, words in blocks:
        body = block_fields(vs, vps, origin)
        for w in words.reshape(-1):
            body += f_varint(7, int(w))
        msgs.append(body)
    with open(os.path.join(OUT, "tsdf_unpacked.vxblx"), "wb") as f:
        f.write(stream(msgs))

    # 2) packed — same logical content; block 0's payload split in two
    #    chunks (decoders must concatenate repeated packed occurrences).
    msgs = [layer_header(vs, vps, "tsdf")]
    for bi, (origin, words) in enumerate(blocks):
        body = block_fields(vs, vps, origin)
        flat = [int(w) for w in words.reshape(-1)]
        if bi == 0:
            cut = len(flat) // 3
            body += f_len(7, b"".join(varint(w) for w in flat[:cut]))
            body += f_len(7, b"".join(varint(w) for w in flat[cut:]))
        else:
            body += f_len(7, b"".join(varint(w) for w in flat))
        msgs.append(body)
    with open(os.path.join(OUT, "tsdf_packed.vxblx"), "wb") as f:
        f.write(stream(msgs))

    # 3) >127 messages: 150 header-only blocks -> 2-byte count varint.
    msgs = [layer_header(vs, vps, "tsdf")]
    for i in range(150):
        msgs.append(block_fields(vs, vps, (0.8 * i, 0.0, 0.0)))
    with open(os.path.join(OUT, "many_blocks.vxblx"), "wb") as f:
        f.write(stream(msgs))
    print("wrote fixtures to", OUT)


if __name__ == "__main__":
    main()
