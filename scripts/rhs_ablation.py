"""Stage-attribute the row-layout RHS ops (round-4 kernel-floor work,
second wave): after the elasticity apply fusion (63.6 us), the two
RHS assembly ops are the largest single ops left in an evolving step —
coupling_rhs_rows 0.221 ms (33 GB/s) and projection_rhs_rows 0.482 ms
(18 GB/s) at 40^3 (BENCH utilization, 2026-08-19).

Times each op's pipeline stages in isolation (in-jit chained slopes,
same methodology as scripts/apply_ablation.py) so the optimization
lands where the milliseconds actually are:

  coupling_rows   : [q1_gather] -> [matmul (81,8)@(8,n^3)] -> [scatter:
                    81x pad+add into 24 accumulators] -> [axis swap]
  projection_rows : [T transpose (24 <-> n+1)] -> [gather 81 (n,Lc)
                    slices -> (81, n*Lc)] -> [matmul (48,81)@(81,n*Lc)]
                    -> [scatter: 8x pad+add into (C, g1^3)]

Usage: python scripts/rhs_ablation.py [--cells N]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

import bench  # noqa: E402
from poroelasticity_dealii_tpu.ops import pallas_comp_major as pcm  # noqa: E402

CELLS = int(sys.argv[sys.argv.index("--cells") + 1]) \
    if "--cells" in sys.argv else 40


def main():
    data, disc, solver, n_dofs = bench.build(cells=CELLS)
    ro = disc.row_ops
    n = CELLS
    dtype = disc.dtype
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(disc.n_pdofs), dtype)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), dtype)
    R = jax.block_until_ready(ro.to_rows(u))

    def rec(name, fn, x, nbytes=None, flops=None):
        ms = bench._time_chained(jax.jit(fn), x)
        line = f"{name:34s} {ms:8.3f} ms"
        if nbytes:
            line += f"  {nbytes / ms * 1e-6:7.1f} GB/s"
        if flops:
            line += f"  {flops / ms * 1e-9:6.2f} TF/s"
        print(line)
        return ms

    g1 = n + 1
    W = pcm._width(n)
    Lc = n * (n + 1)
    lat_p = pcm.node_lattice(1, 3)

    # ---- coupling_rows stages -------------------------------------------
    print(f"# coupling_rows stages (n={n}, dtype={jnp.dtype(dtype).name})")
    rec("coupling_rows (full)", ro.coupling_rows, p, nbytes=p.size * 4 + R.size * 4)

    def c_gather(p_flat):
        P3 = p_flat.reshape(g1, g1, g1).astype(dtype)
        return jnp.stack([P3[oz:oz + n, oy:oy + n, ox:ox + n].reshape(-1)
                          for (ox, oy, oz) in lat_p])
    U8 = jax.block_until_ready(jax.jit(c_gather)(p))
    rec("  q1 gather -> (8, n^3)", c_gather, p, nbytes=(p.size + U8.size) * 4)

    Ce81 = jnp.asarray(rng.standard_normal((81, 8)), dtype)

    def c_matmul(U):
        return jnp.dot(Ce81, U, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
    Ye81 = jax.block_until_ready(jax.jit(c_matmul)(U8))
    rec("  matmul (81,8)@(8,n^3)", c_matmul, U8,
        nbytes=(U8.size + Ye81.size) * 4, flops=2 * 81 * 8 * n ** 3)

    lat_u = pcm.node_lattice(2, 3)

    def c_scatter(Ye):
        acc = [None] * 24
        for a in range(27):
            ox, oy, oz = int(lat_u[a, 0]), int(lat_u[a, 1]), int(lat_u[a, 2])
            base = (((oz & 1) * 2 + (oy & 1)) * 2 + (ox & 1)) * 3
            pw = ((oz >> 1, 1 - (oz >> 1)), (oy >> 1, 1 - (oy >> 1)),
                  (ox >> 1, 1 - (ox >> 1)))
            for c in range(3):
                Pd = jnp.pad(Ye[a * 3 + c].reshape(n, n, n), pw)
                r = base + c
                acc[r] = Pd if acc[r] is None else acc[r] + Pd
        A = jnp.stack(acc)
        Rr = jnp.swapaxes(A, 0, 1).reshape((n + 1) * 24, (n + 1) * (n + 1))
        return jnp.pad(Rr, ((0, 0), (0, W - Rr.shape[1])))
    rec("  scatter 81x pad+add + swap", c_scatter, Ye81,
        nbytes=(Ye81.size + R.size) * 4)

    # ---- projection_rows stages -----------------------------------------
    print(f"# projection_rows stages")
    rhs = jax.block_until_ready(jax.jit(ro.projection_rows)(R))
    C = rhs.shape[0]
    rec("projection_rows (full)", ro.projection_rows, R,
        nbytes=R.size * 4 + rhs.size * 4)

    def p_transpose(Rr):
        return Rr[:(n + 1) * 24].reshape(n + 1, 24, -1).swapaxes(0, 1)
    T = jax.block_until_ready(jax.jit(p_transpose)(R))
    rec("  T transpose (24 <-> n+1)", p_transpose, R, nbytes=2 * R.size * 4)

    params = pcm._slice_params(n)

    def p_gather(T):
        ops_rows = []
        for (dz, base, shift) in params:
            for c in range(3):
                sl = T[base + c, dz:dz + n, shift:shift + Lc]
                ops_rows.append(sl.reshape(-1))
        return jnp.stack(ops_rows)
    U81 = jax.block_until_ready(jax.jit(p_gather)(T))
    rec("  gather 81 (n,Lc) -> (81,n*Lc)", p_gather, T,
        nbytes=(T.size + U81.size) * 4)

    Pe = jnp.asarray(rng.standard_normal((C * 8, 81)), dtype)

    def p_matmul(U):
        return jnp.dot(Pe, U, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
    Ye48 = jax.block_until_ready(jax.jit(p_matmul)(U81))
    rec("  matmul (48,81)@(81,n*Lc)", p_matmul, U81,
        nbytes=(U81.size + Ye48.size) * 4, flops=2 * C * 8 * 81 * n * Lc)

    mask = pcm.cell_lane_mask(n, dtype)

    def p_scatter(Ye):
        Ye = Ye * jnp.tile(mask, n)[None, :]
        Yc = Ye.reshape(8, C, n, n, n + 1)[..., :n]
        acc = None
        for i_p in range(8):
            ox, oy, oz = (int(lat_p[i_p, 0]), int(lat_p[i_p, 1]),
                          int(lat_p[i_p, 2]))
            pw = ((0, 0), (oz, 1 - oz), (oy, 1 - oy), (ox, 1 - ox))
            Pd = jnp.pad(Yc[i_p], pw)
            acc = Pd if acc is None else acc + Pd
        return acc.reshape(C, g1 * g1 * g1)
    rec("  scatter 8x pad+add", p_scatter, Ye48,
        nbytes=(Ye48.size + rhs.size) * 4)

    # fused variants worth testing before reaching for Pallas:
    # (a) gather+matmul in one jit (lets XLA fuse the slice into the dot)
    def p_gmm(T):
        return p_matmul(p_gather(T))
    rec("  fused gather+matmul", p_gmm, T,
        nbytes=(T.size + Ye48.size) * 4, flops=2 * C * 8 * 81 * n * Lc)

    def c_gmm(p_flat):
        return c_matmul(c_gather(p_flat))
    rec("  fused q1-gather+matmul (coupling)", c_gmm, p,
        nbytes=(p.size + Ye81.size) * 4, flops=2 * 81 * 8 * n ** 3)


if __name__ == "__main__":
    main()
