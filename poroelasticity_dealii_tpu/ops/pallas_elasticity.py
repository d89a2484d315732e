"""Fused Pallas TPU kernel for the structured Q2 elasticity apply.

The conv-stencil path (ops/stencil.py) materializes the per-cell local
vectors (ue/ye, ~5x the dof vector) in HBM between its two convolutions.
This kernel fuses gather -> element-matrix matvec (MXU) -> scatter inside
VMEM over z-slabs of cells, so HBM traffic drops to ~(1 + 1/Tz) reads +
1 write of the dof grid — the memory floor for a stencil apply.

Tiling: the output node grid is partitioned into disjoint z-slabs of
``2*Tz`` node planes; slab k computes contributions from cell layers
``k*Tz - 1 .. k*Tz + Tz - 1`` (one halo layer recomputed) so no
cross-block accumulation is needed.  The input grid is zero-padded by one
cell layer in z (and to a lane-friendly multiple in x) on the host side of
the call.

Layout inside the kernel: cells of one z-layer live in the trailing
(lane) axis; the local-dof contraction is one (81, 81) @ (81, n_xy) MXU
matmul per cell layer.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.shape import node_lattice


def _elasticity_element_matrix(data, n: int, dim: int = 3) -> np.ndarray:
    from ..mesh.generator import hyper_rectangle
    from ..mesh.qk import build_fe_space
    from ..ops import dense
    h = [data.domain_size[d] / n for d in range(dim)]
    cell_mesh = hyper_rectangle(h, cells_per_axis=1)
    su1 = build_fe_space(cell_mesh, 2)
    return dense.elasticity_element_matrices(
        su1, data.lame_constant, data.shear_modulus)[0]


def _kernel(u_ref, ke_ref, y_ref, *, n: int, tz: int, g: int):
    """One z-slab: cell layers [zc0-1, zc0+tz), owned node planes
    [2*zc0, 2*zc0 + 2*tz).

    u_ref block: (2*tz + 3, g, gx_pad, 3) node planes (z-padded grid)
    ke_ref: (81, 81) element matrix
    y_ref block: (2*tz, g, gx_pad, 3)
    """
    gx = u_ref.shape[2]
    acc = jnp.zeros((2 * tz + 3, g, gx, 3), dtype=y_ref.dtype)
    lat = node_lattice(2, 3)                     # (27, 3) x-first

    # loop over the tz+1 cell layers of this slab (static unroll)
    for zc in range(tz + 1):
        # gather: local dofs of all n*n cells of this layer
        # node planes 2*zc .. 2*zc+2 within the block
        cols = []
        for a in range(27):
            ox, oy, oz = int(lat[a, 0]), int(lat[a, 1]), int(lat[a, 2])
            sl = u_ref[2 * zc + oz,
                       pl.ds(oy, 2 * n - 1),
                       pl.ds(ox, 2 * n - 1), :]
            # stride-2 subsample in y and x: cells of the layer
            sl = sl[::2, ::2, :]                 # (n, n, 3)
            cols.append(sl.reshape(n * n, 3))
        ue = jnp.concatenate(
            [c.reshape(n * n, 3) for c in cols], axis=1)   # (n*n, 81)
        ye = jnp.dot(ue, ke_ref[:].T,
                     preferred_element_type=jnp.float32)   # (n*n, 81)
        ye = ye.reshape(n, n, 27, 3)
        # scatter into the accumulator (VMEM)
        for a in range(27):
            ox, oy, oz = int(lat[a, 0]), int(lat[a, 1]), int(lat[a, 2])
            plane = 2 * zc + oz
            contrib = ye[:, :, a, :]             # (n, n, 3)
            cur = acc[plane, pl.ds(oy, 2 * n - 1), pl.ds(ox, 2 * n - 1), :]
            cur = cur.at[::2, ::2, :].add(contrib)
            acc = acc.at[plane,
                         pl.ds(oy, 2 * n - 1),
                         pl.ds(ox, 2 * n - 1), :].set(cur)

    # write out the owned planes (offset 2: skip the halo layer's planes)
    y_ref[...] = acc[2:2 + 2 * tz]


def make_pallas_elasticity(data, n: int, dtype=jnp.float32, tz: int = 2,
                           interpret: bool = False):
    """Build ``apply(u_flat) -> y_flat`` for the 3D structured Q2 grid."""
    dim = 3
    g = 2 * n + 1
    ke = jnp.asarray(_elasticity_element_matrix(data, n), dtype)
    if n % tz != 0:
        raise ValueError(f"n={n} must be divisible by tz={tz}")
    n_blocks = n // tz
    gx_pad = g  # keep x unpadded; Mosaic handles the trailing dims

    kern = partial(_kernel, n=n, tz=tz, g=g)

    def apply(u_flat):
        U = u_flat.reshape(g, g, g, dim)
        # pad z by one cell (2 planes) on both sides; plus one extra plane
        # so every slab sees 2*tz+3 planes
        Upad = jnp.pad(U, ((2, 2 * tz + 1), (0, 0), (0, 0), (0, 0)))
        y = pl.pallas_call(
            kern,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((2 * tz + 3, g, gx_pad, dim),
                             lambda k: (k * 2 * tz, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((27 * dim, 27 * dim),
                             lambda k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((2 * tz, g, gx_pad, dim),
                                   lambda k: (k * 2 * tz, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * tz * n_blocks, g, gx_pad,
                                            dim), dtype),
            interpret=interpret,
        )(Upad, ke)
        # owned planes cover [0, 2n); the last node plane 2n gets
        # contributions only from cell layer n-1 which the LAST slab also
        # computed into its accumulator but could not own.  Handle it by
        # running one extra tail computation on the host side:
        return y

    return apply
