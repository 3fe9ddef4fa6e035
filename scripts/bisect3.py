#!/usr/bin/env python
import os, sys, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_ksd_bench"))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from kimera_semantics_tpu.config import (FusionConfig, GridConfig,
                                         PipelineConfig, SemanticConfig,
                                         TsdfConfig)
from kimera_semantics_tpu.core.camera import PinholeIntrinsics
from kimera_semantics_tpu.ops import mip as mip_ops

PROJ_BPS = 8
BPS, V3, ROWS, COLS = 8, 4096, 128, 256
VARIANT = os.environ.get("VARIANT", "epi")
CUT = set(os.environ.get("CUT", "").split(","))

def _proj_kernel(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg,
                 atlas_b, w_ref, wsdf_ref, cnt_ref, lab_ref, wc_ref,
                 samp, e_scratch, rc_scratch, *, cfg, intr, plan,
                 with_color):
    """Per grid step: PROJ_BPS touched blocks.

    Vector phase ((BPS, V3) planes, voxels on lanes): voxel centers ->
    camera -> projected mip coords. Per-block phase: patch slice from the
    VMEM-resident atlas (offsets 8/128-aligned by block_patch_meta), one-hot
    MXU contraction per channel. Epilogue: the exact ops/projective.py
    update math (shared code), outputs written as (BPS, V3) blocks.

    samp scratch rows: [0..BPS) depth, [BPS..2BPS) label (+ rg, b when
    with_color).
    """
    i = pl.program_id(0)
    g = cfg.grid
    vps, V3 = g.voxels_per_side, g.vps3
    ROWS, COLS = plan.row_window, plan.col_window
    BPS = PROJ_BPS
    f32 = jnp.float32

    mv = metav_ref[:]                                   # (BPS, 8) int32
    real_v = mv[:, 2:3] > 0
    lvl = mv[:, 3:4]
    u0l = mv[:, 4:5]
    v0v = mv[:, 0:1]
    bx, by, bz = mv[:, 5:6], mv[:, 6:7], mv[:, 7:8]

    # Voxel centers (BPS, V3).
    lin = jax.lax.broadcasted_iota(jnp.int32, (BPS, V3), 1)
    lx = lin // (vps * vps)
    ly = (lin // vps) % vps
    lz = lin % vps
    vs = f32(g.voxel_size)
    cx = ((bx * vps + lx).astype(f32) + 0.5) * vs
    cy = ((by * vps + ly).astype(f32) + 0.5) * vs
    cz = ((bz * vps + lz).astype(f32) + 0.5) * vs

    T = tcg_ref[:]                                      # (1, 128) f32
    def tc(j):
        return T[:, j:j + 1]
    if "tc" in CUT:
        pX = cx + cy
        pY = cy + cz
        pZ = cz + cx
    else:
        pX = tc(0) * cx + tc(1) * cy + tc(2) * cz + tc(3)
        pY = tc(4) * cx + tc(5) * cy + tc(6) * cz + tc(7)
        pZ = tc(8) * cx + tc(9) * cy + tc(10) * cz + tc(11)
    zok = pZ > 1e-3
    zsafe = jnp.maximum(pZ, 1e-3)
    u = f32(intr.fx) * pX / zsafe + f32(intr.cx)
    v = f32(intr.fy) * pY / zsafe + f32(intr.cy)
    ui = jnp.floor(u + 0.5).astype(jnp.int32)
    vi = ui + 1 if "vi" in CUT else jnp.floor(v + 0.5).astype(jnp.int32)
    if "inimg" in CUT:
        in_img = zok
    else:
        in_img = (zok & (ui >= 0) & (ui < plan.width) & (vi >= 0)
                  & (vi < plan.height))
    if "shift" in CUT:
        ul = jnp.clip(ui, 0, plan.width - 1)
        vl = jnp.clip(vi, 0, plan.height - 1)
    else:
        ul = jnp.right_shift(jnp.clip(ui, 0, plan.width - 1), lvl)
        vl = jnp.right_shift(jnp.clip(vi, 0, plan.height - 1), lvl)
    if "lvlok" in CUT:
        lvl_ok = ul >= 0
    else:
        lvl_ok = ((ul < jnp.right_shift(jnp.full_like(lvl, plan.width), lvl))
                  & (vl < jnp.right_shift(jnp.full_like(lvl, plan.height),
                                          lvl)))
    if "clip" in CUT:
        row = jnp.clip(vl - v0v, 0, plan.row_window - 1)
        col = jnp.clip(ul - u0l, 0, plan.col_window - 1)
    else:
        row = vl - v0v
        col = ul - u0l
    # Round-trip row/col through scratch: the one-hot compare feeding the MXU
    # must read from a plain VMEM buffer (a long traced producer chain gives
    # Mosaic a layout it rejects as a dot operand — "Bad lhs type").
    if "vec" in CUT:
        row = lin % plan.row_window
        col = lin % plan.col_window
    rc_scratch[0:BPS, :] = row
    rc_scratch[BPS:2 * BPS, :] = col
    if "dots" in CUT:
        samp[0:BPS, :] = cx
        samp[BPS:2 * BPS, :] = cy

    riota = jax.lax.broadcasted_iota(jnp.int32, (ROWS, V3), 0)
    ciota = jax.lax.broadcasted_iota(jnp.int32, (COLS, V3), 0)
    n_ch = 6 if with_color else 3

    for b in ([] if "dots" in CUT else list(range(BPS))):
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
            if with_color:
                prg = atlas_rg[pl.ds(v0b, ROWS), pl.ds(u0b, COLS)]
                rg_hi = prg.astype(jnp.bfloat16)
                rg_lo = (prg - rg_hi.astype(f32)).astype(jnp.bfloat16)
                chans += [rg_hi, rg_lo,
                          atlas_b[pl.ds(v0b, ROWS),
                                  pl.ds(u0b, COLS)].astype(jnp.bfloat16)]
            Ct = (rc_scratch[BPS + b:BPS + b + 1, :] == ciota
                  ).astype(jnp.bfloat16)
            Rt = (rc_scratch[b:b + 1, :] == riota).astype(f32)
            acc = []
            for ch in chans:
                e_scratch[:] = jax.lax.dot_general(
                    ch, Ct, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)          # (ROWS, V3)
                acc.append(jnp.sum(e_scratch[:] * Rt, axis=0,
                                   keepdims=True))       # (1, V3)
            samp[b:b + 1, :] = acc[0] + acc[1]           # depth
            samp[BPS + b:BPS + b + 1, :] = acc[2]        # label
            if with_color:
                samp[2 * BPS + b:2 * BPS + b + 1, :] = acc[3] + acc[4]
                samp[3 * BPS + b:3 * BPS + b + 1, :] = acc[5]

    from kimera_semantics_tpu.ops import projective as proj_ops
    from kimera_semantics_tpu.ops import mip as mip_ops
    depth = samp[0:BPS, :]
    label = jnp.round(samp[BPS:2 * BPS, :]).astype(jnp.int32)
    if "epi" not in CUT:
        sok = (pZ > 0) if "sampleok" in CUT else (in_img & lvl_ok)
        rv = (pZ[:, 0:1] > -1e9) if "realv" in CUT else real_v
        if "xyz" in CUT:
            pX = pZ
            pY = pZ
        w, w_sdf, cnt, upd, color_gate = proj_ops.update_terms_from_sample(
            depth, label, pX, pY, pZ, zsafe, sok, rv, cfg)
        w_ref[:] = w
        wsdf_ref[:] = w_sdf
        cnt_ref[:] = cnt
        lab_ref[:] = jnp.where(upd, label, 0)
    else:
        upd = in_img
        color_gate = in_img
        w = depth
        w_ref[:] = depth
        wsdf_ref[:] = depth
        cnt_ref[:] = depth
        lab_ref[:] = label
    if with_color:
        rg = samp[2 * BPS:3 * BPS, :]
        bb = samp[3 * BPS:4 * BPS, :]
        rgb3 = mip_ops.unpack_color(rg, bb)              # (BPS, V3, 3)
        wc = jnp.where(upd & color_gate, w, 0.0)
        for c in range(3):
            wc_ref[:, c, :] = wc * rgb3[..., c]
    else:
        wc_ref[:] = jnp.zeros_like(wc_ref)




def kernel1(meta_s, tcg_ref, metav_ref, atlas_d, atlas_l, atlas_rg, atlas_b,
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



def _proj_kernel_swapped(meta_s, tcg, metav, ad, al, arg, ab, w, wsdf, cnt,
                         lab, wc, samp, e, rc, *, cfg, intr, plan,
                         with_color):
    return kernel1(meta_s, tcg, metav, ad, al, arg, ab, w, wsdf, cnt, lab,
                   wc, samp, e, rc)

def run_it():
    cfg = FusionConfig(
        grid=GridConfig(voxel_size=0.05, voxels_per_side=16,
                        block_capacity=4096),
        tsdf=TsdfConfig(), semantic=SemanticConfig(),
        pipeline=PipelineConfig())
    intr = PinholeIntrinsics(fx=320.0, fy=320.0, cx=319.5, cy=239.5,
                             width=640, height=480)
    plan = mip_ops.make_plan(480, 640, 128, 256)
    rng = np.random.RandomState(0)
    K = 512
    V3 = cfg.grid.vps3
    BPS = PROJ_BPS
    ROWS = plan.row_window
    meta = np.zeros((K, 8), np.int32)
    meta[:, 0] = rng.randint(0, (plan.atlas_height - 128) // 8, K) * 8
    meta[:, 1] = rng.randint(0, (plan.atlas_width - 256) // 128, K) * 128
    meta[:, 2] = 1
    meta[:, 3] = rng.randint(0, plan.num_levels, K)
    meta[:, 4] = meta[:, 1] - np.array(plan.offsets)[meta[:, 3]]
    meta[:, 5:8] = rng.randint(-10, 10, (K, 3))
    tflat = jnp.zeros((1, 128), jnp.float32).at[0, :12].set(
        jnp.eye(3, 4).reshape(-1))
    if "atl" in CUT:
        A = [jnp.asarray(rng.uniform(0.2, 5.0,
             (plan.atlas_height, plan.atlas_width)).astype(np.float32))
             for _ in range(4)]
    else:
        atlas = jnp.asarray(rng.uniform(0.2, 5.0,
            (4, plan.atlas_height, plan.atlas_width)).astype(np.float32))
        A = [atlas[i] for i in range(4)]
    kfn = _proj_kernel_swapped if "swap" in CUT else _proj_kernel
    kernel = functools.partial(kfn, cfg=cfg, intr=intr, plan=plan,
                               with_color=False)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    bykv = lambda: pl.BlockSpec((BPS, V3), lambda i, m: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(K // BPS,),
        in_specs=[full(), pl.BlockSpec((BPS, 8), lambda i, m: (i, 0)),
                  full(), full(), full(), full()],
        out_specs=[bykv(), bykv(), bykv(), bykv(),
                   pl.BlockSpec((BPS, 3, V3), lambda i, m: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((2 * BPS, V3), jnp.float32),
            pltpu.VMEM((ROWS, V3), jnp.float32),
            pltpu.VMEM((2 * BPS, V3), jnp.int32),
        ],
    )
    out_shapes = [jax.ShapeDtypeStruct((K, V3), jnp.float32),
                  jax.ShapeDtypeStruct((K, V3), jnp.float32),
                  jax.ShapeDtypeStruct((K, V3), jnp.float32),
                  jax.ShapeDtypeStruct((K, V3), jnp.int32),
                  jax.ShapeDtypeStruct((K, 3, V3), jnp.float32)]
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    if "jit" in CUT:
        call = jax.jit(call)
    out = call(jnp.asarray(meta), tflat, jnp.asarray(meta),
               A[0], A[1], A[2], A[3])
    jax.block_until_ready(out)
    print("CUT=", sorted(CUT), "OK")

run_it()
