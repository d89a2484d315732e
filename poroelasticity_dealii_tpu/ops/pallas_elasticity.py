"""Fused Pallas TPU kernel for the structured 3D Q2 elasticity apply.

The conv-stencil path (ops/stencil.py) materializes the per-cell local
vectors (~5x the dof grid) in HBM between its two convolutions.  This
kernel fuses gather -> element-matrix matmul (MXU) -> scatter inside VMEM
over z-slabs of cells, reducing HBM traffic to ~(1 + 1/Tz) reads + 1 write
of the dof grid — the memory floor for a stencil operator.

Key layout tricks (all for Mosaic-friendliness):

* the node grid is pre-split (host side, cheap) into its 8 per-axis
  **parity subgrids**, stored z-major-interleaved as a rank-4 array
  ``(z*8+q, n+1, n+1, 3)`` — every slab's input range and output block is
  one contiguous row range (single DMA, plain BlockSpec);
* every per-cell local-dof gather and every assembly scatter is a
  *contiguous* shifted slice of one parity plane — no strided memory ops,
  no scatter/pad primitives in-kernel (shift placement via concatenation
  with zero borders);
* slab boundaries are covered by recomputing one halo cell layer, so
  output blocks stay disjoint.

Correctness is verified against the conv path in interpret mode
(tests/test_pallas.py).

STATUS: experimental (interpret-verified; Mosaic-on-device blocked).
Probed Mosaic constraints on this jax/libtpu stack (2026-08):

* dynamically-indexed HBM->VMEM DMA works for 2-D refs ``(rows, 256)`` but
  FAILS (compile-helper crash) for 3-D/4-D refs even with 128-multiple
  trailing dims;
* an in-kernel value reshape ``(8, 243) -> (8, 9, 9, 3)`` also fails.

So a working version must keep the entire dataflow 2-D with lane-friendly
widths: flatten each z-plane to ``(rows, W)`` with W padded to 128k, build
the ``(nn, 81)`` matmul operand via 2-D dynamic slices only, and scatter
with 2-D adds.  That redesign is queued for round 2 (docs/ROADMAP.md).  The
production elasticity apply remains the conv-stencil path (ops/stencil.py),
~7 ms/apply at 1.66M DOF.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.shape import node_lattice


def elasticity_element_matrix(data, n: int, dim: int = 3) -> np.ndarray:
    from ..mesh.generator import hyper_rectangle
    from ..mesh.qk import build_fe_space
    from ..ops import dense
    h = [data.domain_size[d] / n for d in range(dim)]
    cell_mesh = hyper_rectangle(h, cells_per_axis=1)
    su1 = build_fe_space(cell_mesh, 2)
    return dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]


def split_parities(U, n: int):
    """(2n+1, 2n+1, 2n+1, 3) node grid -> (8, n+1, n+1, n+1, 3);
    parity q = px + 2*py + 4*pz; odd axes zero-padded to n+1."""
    parts = []
    for q in range(8):
        px, py, pz = q & 1, (q >> 1) & 1, (q >> 2) & 1
        P = U[pz::2, py::2, px::2, :]
        pad = [(0, (n + 1) - P.shape[0]), (0, (n + 1) - P.shape[1]),
               (0, (n + 1) - P.shape[2]), (0, 0)]
        parts.append(jnp.pad(P, pad))
    return jnp.stack(parts)


def merge_parities(parts, n: int):
    """Inverse of :func:`split_parities` -> (2n+1, 2n+1, 2n+1, 3)."""
    g = 2 * n + 1
    U = jnp.zeros((g, g, g, parts.shape[-1]), parts.dtype)
    for q in range(8):
        px, py, pz = q & 1, (q >> 1) & 1, (q >> 2) & 1
        nz, ny, nx = n + 1 - pz, n + 1 - py, n + 1 - px
        U = U.at[pz::2, py::2, px::2, :].set(parts[q, :nz, :ny, :nx, :])
    return U


def _place(contrib, sy: int, sx: int, n: int):
    """Pad an (n, n, 3) block into (n+1, n+1, 3) at offset (sy, sx) using
    concatenation with zero borders (Mosaic-safe)."""
    dtype = contrib.dtype
    rows = [contrib]
    if sx == 0:
        rows = [jnp.concatenate(
            [contrib, jnp.zeros((n, 1, 3), dtype)], axis=1)]
    else:
        rows = [jnp.concatenate(
            [jnp.zeros((n, 1, 3), dtype), contrib], axis=1)]
    body = rows[0]
    if sy == 0:
        return jnp.concatenate([body, jnp.zeros((1, n + 1, 3), dtype)],
                               axis=0)
    return jnp.concatenate([jnp.zeros((1, n + 1, 3), dtype), body], axis=0)


def _kernel(uin_hbm, ke_ref, out_ref, scratch, sem, *, n: int, tz: int):
    """One z-slab: cell layers [z0-1, z0+tz), owned parity-z [z0, z0+tz).

    uin_hbm: ((zpad_in)*8, n+1, n+1, 3) z-major parity rows, z-padded by 1.
    out_ref block: (tz*8, n+1, n+1, 3).
    scratch: ((tz+2)*8, n+1, n+1, 3) VMEM.
    """
    k = pl.program_id(0)
    z0 = k * tz

    dma = pltpu.make_async_copy(
        uin_hbm.at[pl.ds(z0 * 8, (tz + 2) * 8)], scratch, sem)
    dma.start()
    dma.wait()

    lat = node_lattice(2, 3)                       # (27, 3) x-first
    acc = [[jnp.zeros((n + 1, n + 1, 3), out_ref.dtype)
            for _ in range(8)] for _ in range(tz)]

    for zr in range(tz + 1):                       # cell layer zc = z0-1+zr
        cols = []
        for a in range(27):
            ox, oy, oz = int(lat[a, 0]), int(lat[a, 1]), int(lat[a, 2])
            q = (ox & 1) + 2 * (oy & 1) + 4 * (oz & 1)
            row = (zr + oz // 2) * 8 + q           # z-major parity row
            sy, sx = oy // 2, ox // 2
            cols.append(scratch[row, sy:sy + n, sx:sx + n, :])
        ue = jnp.concatenate(cols, axis=-1)        # (n, n, 81)
        ye = jnp.dot(ue.reshape(n * n, 81), ke_ref[:].T,
                     preferred_element_type=out_ref.dtype)
        zc = z0 - 1 + zr                           # mask phantom layers
        valid = ((zc >= 0) & (zc < n)).astype(out_ref.dtype)
        ye = (ye * valid).reshape(n, n, 27, 3)

        for a in range(27):
            ox, oy, oz = int(lat[a, 0]), int(lat[a, 1]), int(lat[a, 2])
            q = (ox & 1) + 2 * (oy & 1) + 4 * (oz & 1)
            t_rel = (zr - 1) + oz // 2             # target parity-z - z0
            if 0 <= t_rel < tz:
                placed = _place(ye[:, :, a, :], oy // 2, ox // 2, n)
                acc[t_rel][q] = acc[t_rel][q] + placed

    out_ref[...] = jnp.stack([acc[t][q] for t in range(tz)
                              for q in range(8)])


def make_pallas_elasticity(element_matrix: np.ndarray, n: int,
                           dtype=jnp.float32, tz: int = 2,
                           interpret: bool = False):
    """Build ``apply(u_flat) -> y_flat`` for a 3D structured Q2 grid with
    ``n`` cells per axis and the given (uniform-cell) element matrix."""
    dim = 3
    g = 2 * n + 1
    ke = jnp.asarray(element_matrix, dtype)
    n_blocks = -(-n // tz) + 1       # +1 tail block owns parity-z index n
    zpad_in = n_blocks * tz + 2      # front halo 1 + coverage
    zpad_out = n_blocks * tz

    kern = partial(_kernel, n=n, tz=tz)

    @jax.jit
    def apply(u_flat):
        U = u_flat.reshape(g, g, g, dim)
        parts = split_parities(U, n)               # (8, n+1, n+1, n+1, 3)
        parts = jnp.pad(parts, ((0, 0), (1, zpad_in - (n + 1) - 1),
                                (0, 0), (0, 0), (0, 0)))
        # z-major parity rows: (zpad_in*8, n+1, n+1, 3)
        zin = jnp.moveaxis(parts, 0, 1).reshape(zpad_in * 8, n + 1, n + 1,
                                                dim)
        out = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((81, 81), lambda k: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tz * 8, n + 1, n + 1, dim),
                                   lambda k: (k, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((zpad_out * 8, n + 1, n + 1,
                                            dim), dtype),
            scratch_shapes=[
                pltpu.VMEM(((tz + 2) * 8, n + 1, n + 1, dim), dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(zin, ke)
        parts_out = jnp.moveaxis(
            out.reshape(zpad_out, 8, n + 1, n + 1, dim), 1, 0)
        Y = merge_parities(parts_out[:, :n + 1], n)
        return Y.reshape(-1)

    return apply
