"""Roofline forensics for the mechanics CG iteration (round-4 verdict #2).

Measures, all in-jit chained (dispatch/RTT excluded, methodology of
bench._time_chained):

  1. raw HBM streaming at the row-array footprint (the achievable-BW bar),
  2. free_apply alone (the Pallas v4 kernel; honest traffic = 3R: input
     slab DMA + free-mask slab DMA + output tile),
  3. the FULL production CG iteration exactly as cg_solve runs it
     (free_apply + 2 dots + 3 axpys + Jacobi + norm),
  4. the CG algebra alone (iteration minus the apply),
  5. kernel ablations: DMA-only (same slab traffic, no compute) and
     matmul-only (no scatter RMWs) variants to attribute the kernel's time
     between DMA, MXU, and the per-layer VMEM shuffle.

Usage: python scripts/cg_iteration_bench.py [--cells N] [--tc T]
"""

import math
import os
import sys
import time
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

import bench  # noqa: E402  (repo-root bench.py: _time_chained etc.)

CELLS = int(sys.argv[sys.argv.index("--cells") + 1]) \
    if "--cells" in sys.argv else 40
TC = int(sys.argv[sys.argv.index("--tc") + 1]) if "--tc" in sys.argv else None


def main():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from poroelasticity_dealii_tpu.ops import pallas_comp_major as pcm

    data, disc, solver, n_dofs = bench.build(cells=CELLS)
    ro = disc.row_ops
    assert ro is not None
    n = CELLS
    rng = np.random.default_rng(0)
    R = ro.to_rows(jnp.asarray(
        rng.standard_normal(disc.n_udofs), disc.dtype))
    R = jax.block_until_ready(R * ro.free_mask_rows)
    rbytes = R.size * R.dtype.itemsize
    print(f"# rows array: {R.shape} = {rbytes/1e6:.1f} MB", file=sys.stderr)

    results = {}

    def rec(name, ms, nbytes=None, flops=None):
        line = f"{name:28s} {ms*1e3:9.1f} us"
        d = {"us": round(ms * 1e3, 1)}
        if nbytes:
            d["gbps"] = round(nbytes / (ms * 1e-3) / 1e9, 1)
            line += f"  {d['gbps']:7.1f} GB/s"
        if flops:
            d["tflops"] = round(flops / (ms * 1e-3) / 1e12, 2)
            line += f"  {d['tflops']:6.2f} TF/s"
        results[name] = d
        print(line)

    # 1. raw HBM streaming bar.  NOTE: a single R-sized (7 MB) loop-carried
    # array FITS IN VMEM — XLA keeps it resident and a chained axpy on it
    # measures VMEM, not HBM (first attempt read 2.8 TB/s).  Stream a
    # VMEM-busting footprint instead: one pass over 10R in, R out.
    big = jnp.asarray(rng.standard_normal((10,) + R.shape), disc.dtype)
    big = jax.block_until_ready(big)
    stream = jax.jit(lambda x: (big * x[None]).sum(0))
    rec("hbm_stream_11R", bench._time_chained(stream, R), 11 * rbytes)

    # 2. the production apply (v4 free-subspace kernel)
    rec("free_apply_3R", bench._time_chained(ro.free_apply, R),
        3 * rbytes, 2 * disc.n_cells * (81 * 3) ** 2 / 9)  # blocked flops

    # 3. full CG iteration exactly as cg_solve.body runs it (Jacobi,
    #    non-flexible): ap, 2 dots, 2 axpys, precond, p-update, norm
    inv_diag = 1.0 / ro.diag_rows

    def cg_iter(carry):
        x, r, p, rz = carry
        ap = ro.free_apply(p)
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r_new = r - alpha * ap
        z = r_new * inv_diag
        rz_new = jnp.vdot(r_new, z)
        beta = rz_new / rz
        p = z + beta * p
        rnorm = jnp.linalg.norm(r_new)
        # thread rnorm so nothing is dead code
        return (x, r_new, p, rz_new + 0.0 * rnorm)

    z0 = R * inv_diag
    carry0 = (jnp.zeros_like(R), R, z0, jnp.vdot(R, z0))

    def slope_time(body, carry0, reps_lo, reps_hi):
        """Per-application DEVICE time via the two-chain slope (chains must
        comfortably exceed the ~26 ms tunnel RTT, or block_until_ready's
        round-trip hides the compute — first attempt measured 0.2 us/iter
        because BOTH chains finished inside one RTT)."""
        out = {}
        for reps in (reps_lo, reps_hi):
            @jax.jit
            def run(c, reps=reps):
                return jax.lax.fori_loop(0, reps,
                                         lambda i, cc: body(cc), c)
            jax.block_until_ready(run(carry0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(carry0))
                best = min(best, time.perf_counter() - t0)
            out[reps] = best
        # ms per application (rec() and _time_chained speak milliseconds)
        return (out[reps_hi] - out[reps_lo]) / (reps_hi - reps_lo) * 1e3

    rec("cg_iteration_full", slope_time(cg_iter, carry0, 128, 512))

    # 4. the algebra alone (identical structure, apply replaced by a copy)
    def alg_iter(carry):
        x, r, p, rz = carry
        ap = p            # stand-in: zero-cost apply
        alpha = rz / jnp.vdot(p, ap)
        x = x + alpha * p
        r_new = r - alpha * ap
        z = r_new * inv_diag
        rz_new = jnp.vdot(r_new, z)
        beta = rz_new / rz
        p = z + beta * p
        rnorm = jnp.linalg.norm(r_new)
        return (x, r_new, p, rz_new + 0.0 * rnorm)

    rec("cg_algebra_only", slope_time(alg_iter, carry0, 512, 4096),
        10 * rbytes)

    # 5. kernel ablations: same grid/DMA structure, compute stripped
    W = pcm._width(n)
    tc = TC or pcm.default_tc(n)
    n_blocks = math.ceil(n / tc)
    zh_pad = n_blocks * tc + 1
    pad_rows_n = (zh_pad - (n + 1)) * 24
    Rp_shape = ((n + 1) * 24 + pad_rows_n, W)

    def dma_only_kernel(rows_hbm, out_ref, scratch, sem, *, tc, n_blocks):
        k = pl.program_id(0)
        parity = lambda j: jax.lax.bitwise_and(j, jnp.int32(1))  # noqa

        def get_dma(slot, j):
            return pltpu.make_async_copy(
                rows_hbm.at[pl.ds(j * tc * 24, (tc + 1) * 24)],
                scratch.at[slot], sem.at[slot])

        @pl.when(k == 0)
        def _():
            get_dma(jnp.int32(0), jnp.int32(0)).start()

        @pl.when(k + 1 < n_blocks)
        def _():
            get_dma(parity(k + 1), k + 1).start()

        @pl.when(k < n_blocks)
        def _():
            get_dma(parity(k), k).wait()
            out_ref[...] = scratch[parity(k), 0:tc * 24, :] * 2.0

        @pl.when(k == n_blocks)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    kern = partial(dma_only_kernel, tc=tc, n_blocks=n_blocks)

    @jax.jit
    def dma_only(Rr):
        Rp = jnp.pad(Rr, ((0, pad_rows_n), (0, 0)))
        out = pl.pallas_call(
            kern,
            grid=(n_blocks + 1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((tc * 24, W), lambda k: (k, jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                ((n_blocks + 1) * tc * 24, W), Rr.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, (tc + 1) * 24, W), Rr.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(Rp)
        return out[:(n + 1) * 24]

    rec("kernel_dma_only_2R", bench._time_chained(dma_only, R), 2 * rbytes)

    import json
    print(json.dumps({"cells": CELLS, "tc": tc, "rbytes": rbytes,
                      **results}))


if __name__ == "__main__":
    main()
