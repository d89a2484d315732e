"""Attribute the v4 free-apply kernel's time: DMA vs gather vs MXU vs
scatter (round-4 kernel-floor work).

Runs hacked LOCAL copies of the production kernel (ops/pallas_comp_major
_kernel_v4) with stages disabled, all timed in-jit chained:

  full        : the production kernel (gather + matmul + scatter + mask)
  no_scatter  : gather + matmul; ye reduced into a fixed row block
  no_gather   : matmul + scatter on a FIXED operand slice (no shifts)
  matmul_1    : ONE fused (81x81)@(81,Lc) matmul per layer instead of the
                4 shift-group matmuls (gather unchanged: the 4 shifted
                interval copies land in one VMEM scratch operand)
  dma_only    : slab DMA + copy out

Usage: python scripts/apply_ablation.py [--cells N] [--tc T]
"""

import math
import os
import sys
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
except Exception:
    pass

import bench  # noqa: E402

CELLS = int(sys.argv[sys.argv.index("--cells") + 1]) \
    if "--cells" in sys.argv else 40
TC = int(sys.argv[sys.argv.index("--tc") + 1]) if "--tc" in sys.argv else None


def make_variant(element_matrix, n, free_mask_rows, dtype, tc, mode):
    """A v4-kernel clone with stages toggled by ``mode``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from poroelasticity_dealii_tpu.ops import pallas_comp_major as pcm

    W = pcm._width(n)
    plan, perm = pcm._interval_plan(n)
    Kp = np.asarray(element_matrix)[np.ix_(perm, perm)]
    Ke = jnp.asarray(Kp, dtype)
    lane = pcm.cell_lane_mask(n, dtype)
    lmask = jnp.zeros((1, W), dtype).at[0, :lane.shape[0]].set(lane)
    n_blocks = math.ceil(n / tc)
    zh_pad = n_blocks * tc + 1
    pad_rows_n = (zh_pad - (n + 1)) * 24
    mask_padded = jnp.pad(jnp.asarray(free_mask_rows, dtype),
                          ((0, pad_rows_n), (0, 0)))

    def kernel(nv_ref, rows_hbm, mask_hbm, ke_ref, lmask_ref, out_ref,
               scratch, mscratch, carry, op_scratch, sem, msem):
        k = pl.program_id(0)
        parity = lambda j: jax.lax.bitwise_and(j, jnp.int32(1))  # noqa

        def get_dma(buf, hbm, s, slot, j):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * tc * 24, (tc + 1) * 24)], buf.at[slot],
                s.at[slot])

        @pl.when(k == 0)
        def _():
            get_dma(scratch, rows_hbm, sem, jnp.int32(0), jnp.int32(0)
                    ).start()
            get_dma(mscratch, mask_hbm, msem, jnp.int32(0), jnp.int32(0)
                    ).start()

        @pl.when(k + 1 < n_blocks)
        def _():
            get_dma(scratch, rows_hbm, sem, parity(k + 1), k + 1).start()
            get_dma(mscratch, mask_hbm, msem, parity(k + 1), k + 1).start()

        @pl.when(k < n_blocks)
        def _compute():
            get_dma(scratch, rows_hbm, sem, parity(k), k).wait()
            get_dma(mscratch, mask_hbm, msem, parity(k), k).wait()
            sl = scratch.at[parity(k)]
            msl = mscratch.at[parity(k)]
            Lc = n * (n + 1)
            m = lmask_ref[...]
            Kfull = ke_ref[...]

            out_ref[...] = jnp.zeros_like(out_ref)

            @pl.when(k > 0)
            def _():
                out_ref[0:24, :] += carry[...]
            carry[...] = jnp.zeros_like(carry)

            for zr in range(tc):
                # ---- gather ----
                if mode == "no_gather":
                    U = sl[zr * 24:zr * 24 + 24, 0:Lc]
                    U = jnp.concatenate([U, U, U, sl[zr * 24:zr * 24 + 9,
                                                     0:Lc]], axis=0)
                    ye = jnp.dot(Kfull, U,
                                 preferred_element_type=out_ref.dtype,
                                 precision=jax.lax.Precision.HIGHEST)
                elif mode == "matmul_1":
                    # one fused matmul: build the full 81-row operand in
                    # a VMEM scratch, then a single (81,81)@(81,Lc) dot
                    for (shift, col0, ivs) in plan:
                        row = col0
                        for (dz, r0, cnt) in ivs:
                            op_scratch[row:row + cnt, 0:Lc] = \
                                sl[(zr + dz) * 24 + r0:
                                   (zr + dz) * 24 + r0 + cnt,
                                   shift:shift + Lc]
                            row += cnt
                    ye = jnp.dot(Kfull, op_scratch[:, 0:Lc],
                                 preferred_element_type=out_ref.dtype,
                                 precision=jax.lax.Precision.HIGHEST)
                else:
                    ye = None
                    for (shift, col0, ivs) in plan:
                        parts = [sl[(zr + dz) * 24 + r0:
                                    (zr + dz) * 24 + r0 + cnt,
                                    shift:shift + Lc]
                                 for (dz, r0, cnt) in ivs]
                        U_s = parts[0] if len(parts) == 1 \
                            else jnp.concatenate(parts, axis=0)
                        ncols = sum(cnt for (_, _, cnt) in ivs)
                        K_s = Kfull[:, col0:col0 + ncols]
                        part = jnp.dot(K_s, U_s,
                                       preferred_element_type=out_ref.dtype,
                                       precision=jax.lax.Precision.HIGHEST)
                        ye = part if ye is None else ye + part
                ye = ye * m[:, :Lc]
                valid = (k * tc + zr < nv_ref[0]).astype(out_ref.dtype)
                ye = ye * valid
                # ---- scatter ----
                if mode == "no_scatter":
                    out_ref[zr * 24:zr * 24 + 24, 0:Lc] += \
                        ye[0:24] + ye[24:48] + ye[48:72] \
                        + jnp.concatenate([ye[72:81], ye[0:15]], axis=0)
                else:
                    row = 0
                    for (shift, col0, ivs) in plan:
                        for (dz, r0, cnt) in ivs:
                            blk = ye[row:row + cnt]
                            row += cnt
                            if zr + dz < tc:
                                r = (zr + dz) * 24 + r0
                                out_ref[r:r + cnt, shift:shift + Lc] += blk
                            else:
                                carry[r0:r0 + cnt, shift:shift + Lc] += blk
            out_ref[...] = out_ref[...] * msl[0:tc * 24, :]

        @pl.when(k == n_blocks)
        def _flush():
            slot = parity(jnp.int32(n_blocks - 1))
            m24 = mscratch[slot, tc * 24:(tc + 1) * 24, :]
            out_ref[...] = jnp.zeros_like(out_ref)
            out_ref[0:24, :] = carry[...] * m24

    zero1 = lambda k: (jnp.int32(0),)                      # noqa: E731
    zero2 = lambda k: (jnp.int32(0), jnp.int32(0))         # noqa: E731
    outmap = lambda k: (k, jnp.int32(0))                   # noqa: E731
    nv = jnp.full((1,), n, jnp.int32)

    @jax.jit
    def apply_rows(R):
        from jax.experimental import pallas as pl2  # noqa
        Rp = jnp.pad(R, ((0, pad_rows_n), (0, 0)))
        out = pl.pallas_call(
            kernel,
            grid=(n_blocks + 1,),
            in_specs=[
                pl.BlockSpec((1,), zero1, memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((81, 81), zero2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), zero2, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tc * 24, W), outmap,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                ((n_blocks + 1) * tc * 24, W), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, (tc + 1) * 24, W), dtype),
                pltpu.VMEM((2, (tc + 1) * 24, W), dtype),
                pltpu.VMEM((24, W), dtype),
                pltpu.VMEM((81, W), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(nv, Rp, mask_padded, Ke, lmask)
        return out[:(n + 1) * 24]

    return apply_rows


def main():
    from poroelasticity_dealii_tpu.ops import pallas_comp_major as pcm

    data, disc, solver, n_dofs = bench.build(cells=CELLS)
    ro = disc.row_ops
    n = CELLS
    tc = TC or pcm.default_tc(n)
    rng = np.random.default_rng(0)
    R = ro.to_rows(jnp.asarray(
        rng.standard_normal(disc.n_udofs), disc.dtype))
    R = jax.block_until_ready(R * ro.free_mask_rows)

    ref = ro.free_apply(R)
    Ke = np.asarray(disc.element_ke, np.float64)
    results = {}
    for mode in ("full", "matmul_1", "no_scatter", "no_gather"):
        f = make_variant(Ke, n, ro.free_mask_rows,
                         disc.dtype, tc, mode)
        out = f(R)
        if mode in ("full", "matmul_1"):
            err = float(jnp.linalg.norm(out - ref)
                        / (1e-30 + jnp.linalg.norm(ref)))
            assert err < 1e-5, (mode, err)
        ms = bench._time_chained(f, R)
        results[mode] = round(ms * 1e3, 1)
        print(f"{mode:12s} {ms*1e3:8.1f} us")
    ms = bench._time_chained(ro.free_apply, R)
    results["production"] = round(ms * 1e3, 1)
    print(f"{'production':12s} {ms*1e3:8.1f} us")
    import json
    print(json.dumps({"cells": CELLS, "tc": tc, **results}))


if __name__ == "__main__":
    main()
