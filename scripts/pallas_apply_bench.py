"""Micro-bench for the comp-major Pallas elasticity apply at bench size.

Measures each piece separately on the real device so the layout-conversion
vs kernel vs relayout-copy split is visible:

  python scripts/pallas_apply_bench.py [n] [tc]
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

n = int(sys.argv[1]) if len(sys.argv) > 1 else 40
tc = int(sys.argv[2]) if len(sys.argv) > 2 else 4


def timeit(f, *args, reps=30):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    import dataclasses

    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.ops import dense
    from poroelasticity_dealii_tpu.ops.pallas_comp_major import (
        from_rows, make_pallas_apply, to_rows, _width)
    from poroelasticity_dealii_tpu.solvers.structured import (
        build_grid_discretization, _single_cell_spaces)

    data = read_input_file("configs/consolidation_3d.data")
    data = dataclasses.replace(data, dtype="float32")
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    _, _, su1 = _single_cell_spaces(data, (n,) * 3, 1, 2)
    Ke = dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]

    g = 2 * n + 1
    nd = g ** 3 * 3
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(nd), jnp.float32)
    W = _width(n)
    print(f"# n={n} tc={tc} dofs={nd} W={W} "
          f"rows_bytes={(n+1)*24*W*4/1e6:.1f} MB")

    ms = timeit(jax.jit(disc.elasticity), u)
    print(f"conv path apply        {ms:8.3f} ms")

    to_r = jax.jit(lambda x: to_rows(x, n))
    R = to_r(u)
    ms = timeit(to_r, u)
    print(f"to_rows alone          {ms:8.3f} ms")

    from_r = jax.jit(lambda r: from_rows(r, n))
    ms = timeit(from_r, R)
    print(f"from_rows alone        {ms:8.3f} ms")

    papply = make_pallas_apply(Ke, n, jnp.float32, tc=tc)
    ms = timeit(papply, u)
    print(f"pallas full apply      {ms:8.3f} ms")

    # kernel alone on pre-laid-out input: replicate make_pallas_apply's body
    # minus to_rows/from_rows
    import math
    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from poroelasticity_dealii_tpu.ops.pallas_comp_major import (
        _kernel, _permute_columns, _slice_params, cell_lane_mask)
    Kp = jnp.asarray(_permute_columns(Ke, _slice_params(n)), jnp.float32)
    mask_row = cell_lane_mask(n, jnp.float32)
    mask = jnp.zeros((1, W), jnp.float32).at[0, :mask_row.shape[0]].set(
        mask_row)
    n_blocks = math.ceil(n / tc)
    zh_pad = n_blocks * tc + 1
    kern = partial(_kernel, n=n, tc=tc, W=W)

    @jax.jit
    def kernel_only(Rp):
        return pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((81, 81), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, W), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(((tc + 1) * 24, W), lambda k: (k, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_blocks * (tc + 1) * 24, W), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(((tc + 1) * 24, W), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(Rp, Kp, mask)

    Rpad = jnp.pad(R, ((0, (zh_pad - (n + 1)) * 24), (0, 0)))
    ms = timeit(kernel_only, Rpad)
    print(f"bare pallas_call       {ms:8.3f} ms")

    @jax.jit
    def stitch_only(out):
        blocks = out.reshape(n_blocks, (tc + 1) * 24, W)
        tail_zh = n - (n_blocks - 1) * tc
        parts = []
        for k in range(n_blocks):
            head = blocks[k, :24]
            if k > 0:
                head = head + blocks[k - 1, tc * 24:]
            if k < n_blocks - 1:
                parts += [head, blocks[k, 24:tc * 24]]
            else:
                parts += [head, blocks[k, 24:(tail_zh + 1) * 24]]
        return jnp.concatenate(parts, axis=0)

    out = kernel_only(Rpad)
    ms = timeit(stitch_only, out)
    print(f"stitch alone           {ms:8.3f} ms")

    # flop accounting
    flops = 2 * 81 * 81 * n * (n + 1) * n  # Ke @ U per layer, n layers... per
    # z-layer matmul is (81,81)x(81,n(n+1)) = 2*81*81*n(n+1); n layers
    print(f"# matmul flops/apply = {flops/1e9:.2f} GFLOP")


if __name__ == "__main__":
    main()
