#!/usr/bin/env python
"""Bisect the 'Bad lhs type' Mosaic failure: strip _proj_kernel features
until it compiles. Run: python bisect_projkernel.py <variant>"""
import os, sys, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BPS, V3, ROWS, COLS = 8, 4096, 128, 256
AH, AW = 480, 1280
K = 64
VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"


def kernel(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg, atlas_b,
           w_ref, wsdf_ref, cnt_ref, lab_ref, wc_ref, samp, e_scratch, rc):
    i = pl.program_id(0)
    f32 = jnp.float32
    mv = metav_ref[:]
    lvl = mv[:, 3:4]
    u0l = mv[:, 4:5]
    v0v = mv[:, 0:1]
    bx = mv[:, 5:6]

    lin = jax.lax.broadcasted_iota(jnp.int32, (BPS, V3), 1)
    T = tcg_ref[:]
    if VARIANT in ("full", "noshift", "trivrc", "epi", "vchain"):
        cx = ((bx * 16 + lin % 16).astype(f32) + 0.5) * 0.05
        pZ = T[:, 8:9] * cx + T[:, 11:12]
        zsafe = jnp.maximum(pZ, 1e-3)
        u = f32(320.0) * cx / zsafe + f32(319.5)
        ui = jnp.floor(u + 0.5).astype(jnp.int32)
        if VARIANT == "vchain":
            cy = ((mv[:, 6:7] * 16 + (lin // 16) % 16).astype(f32) + 0.5) * 0.05
            cz = ((mv[:, 7:8] * 16 + lin // 256).astype(f32) + 0.5) * 0.05
            pX = T[:, 0:1] * cx + T[:, 1:2] * cy + T[:, 2:3] * cz + T[:, 3:4]
            pY = T[:, 4:5] * cx + T[:, 5:6] * cy + T[:, 6:7] * cz + T[:, 7:8]
            v2 = f32(320.0) * pY / zsafe + f32(239.5)
            vi = jnp.floor(v2 + 0.5).astype(jnp.int32)
            vl2 = jnp.right_shift(jnp.clip(vi, 0, 479), lvl)
        if VARIANT == "noshift":
            ul = jnp.clip(ui, 0, 639)
        else:
            ul = jnp.right_shift(jnp.clip(ui, 0, 639), lvl)
        if VARIANT == "vchain":
            row = jnp.clip(vl2 - v0v, 0, ROWS - 1)
        else:
            row = jnp.clip(ul % 97, 0, ROWS - 1)
        col = jnp.clip(ul - u0l, 0, COLS - 1)
        if VARIANT == "trivrc":
            row = lin % ROWS
            col = lin % COLS
    else:  # "proto": row/col straight from iota (known-good shape)
        row = lin % ROWS
        col = lin % COLS
        pZ = jnp.ones((BPS, V3), f32)
        zsafe = pZ
    rc[0:BPS, :] = row
    rc[BPS:2 * BPS, :] = col

    riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, V3), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (COLS, V3), 0)
    for b in range(BPS):
        @pl.when(meta_s[i * BPS + b, 2] > 0)
        def _():
            v0b = pl.multiple_of(meta_s[i * BPS + b, 0], 8)
            u0b = pl.multiple_of(meta_s[i * BPS + b, 1], 128)
            pd = atlas_d[pl.ds(v0b, ROWS), pl.ds(u0b, COLS)]
            hi = pd.astype(jnp.bfloat16)
            lo = (pd - hi.astype(f32)).astype(jnp.bfloat16)
            chans = [hi, lo,
                     atlas_l[pl.ds(v0b, ROWS),
                             pl.ds(u0b, COLS)].astype(jnp.bfloat16)]
            Ct = (rc[BPS + b:BPS + b + 1, :] == ciota).astype(jnp.bfloat16)
            Rt = (rc[b:b + 1, :] == riota).astype(f32)
            acc = []
            for ch in chans:
                e_scratch[:] = jax.lax.dot_general(
                    ch, Ct, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)
                acc.append(jnp.sum(e_scratch[:] * Rt, axis=0, keepdims=True))
            samp[b:b + 1, :] = acc[0] + acc[1]
            samp[BPS + b:BPS + b + 1, :] = acc[2]

    depth = samp[0:BPS, :]
    if VARIANT in ("epi", "vchain"):
        from kimera_semantics_tpu.config import FusionConfig, GridConfig
        from kimera_semantics_tpu.ops import projective as proj_ops
        cfg = FusionConfig()
        label = jnp.round(samp[BPS:2 * BPS, :]).astype(jnp.int32)
        w, w_sdf, cnt, upd, gate = proj_ops.update_terms_from_sample(
            depth, label, pZ, pZ, pZ, zsafe, pZ > 0, mv[:, 2:3] > 0, cfg)
        w_ref[:] = w
        wsdf_ref[:] = w_sdf
        cnt_ref[:] = cnt
        lab_ref[:] = jnp.where(upd, label, 0)
        wc_ref[:] = jnp.zeros_like(wc_ref)
    else:
        w_ref[:] = depth * jnp.where(pZ > 0, 1.0, 0.0)
        wsdf_ref[:] = depth
        cnt_ref[:] = depth
        lab_ref[:] = jnp.round(samp[BPS:2 * BPS, :]).astype(jnp.int32)
        wc_ref[:] = jnp.zeros_like(wc_ref)


@jax.jit
def run(meta, tflat, ad, al):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // BPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((BPS, 8), lambda i, m: (i, 0)),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],

        out_specs=[pl.BlockSpec((BPS, V3), lambda i, m: (i, 0)),
                   pl.BlockSpec((BPS, V3), lambda i, m: (i, 0)),
                   pl.BlockSpec((BPS, V3), lambda i, m: (i, 0)),
                   pl.BlockSpec((BPS, V3), lambda i, m: (i, 0)),
                   pl.BlockSpec((BPS, 3, V3), lambda i, m: (i, 0, 0))],
        scratch_shapes=[pltpu.VMEM((2 * BPS, V3), jnp.float32),
                        pltpu.VMEM((ROWS, V3), jnp.float32),
                        pltpu.VMEM((2 * BPS, V3), jnp.int32)],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        out_shape=[jax.ShapeDtypeStruct((K, V3), jnp.float32),
                   jax.ShapeDtypeStruct((K, V3), jnp.float32),
                   jax.ShapeDtypeStruct((K, V3), jnp.float32),
                   jax.ShapeDtypeStruct((K, V3), jnp.int32),
                   jax.ShapeDtypeStruct((K, 3, V3), jnp.float32)],
    )(meta, tflat, meta, ad, al, ad, al)


rng = np.random.RandomState(0)
meta = np.zeros((K, 8), np.int32)
meta[:, 0] = rng.randint(0, (AH - ROWS) // 8, K) * 8
meta[:, 1] = rng.randint(0, (AW - COLS) // 128, K) * 128
meta[:, 2] = 1
meta[:, 3] = rng.randint(0, 4, K)
tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
    jnp.eye(3, 4).reshape(-1))
ad = jnp.asarray(rng.uniform(0.2, 5.0, (AH, AW)).astype(np.float32))
al = jnp.asarray(rng.randint(0, 21, (AH, AW)).astype(np.float32))
out = run(jnp.asarray(meta), tflat, ad, al)
jax.block_until_ready(out)
print("VARIANT", VARIANT, "OK")
