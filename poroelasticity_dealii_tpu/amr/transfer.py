"""Nodal solution transfer across remeshing.

The deal.II ``SolutionTransfer`` analogue (``PoroelasticityFSS.h:474-497``):
{p, eps_v, eps_v0} move from the old mesh to the new one by evaluating the
old (continuous, constraint-distributed) Q1 field at the new node locations
— exact injection where the meshes coincide, parent-cell interpolation under
refinement, child-corner injection under coarsening.
"""

from __future__ import annotations

import numpy as np

from .forest import QuadForest


def transfer_nodal(forest_old: QuadForest, mesh_old, values: np.ndarray,
                   new_points: np.ndarray) -> np.ndarray:
    """Evaluate the old Q1 field(s) at ``new_points``.

    Args:
      values: ``(..., n_old_vertices)`` nodal values (hanging entries must
        already be distributed — they are, the solver keeps them consistent).
      new_points: ``(P, 2)`` physical coordinates.
    Returns ``(..., P)``.
    """
    dim = new_points.shape[1]
    leaves = forest_old.sorted_leaves()
    Lmax = forest_old.max_level
    R = 2 ** Lmax
    lo = forest_old.lower
    sz = forest_old.upper - forest_old.lower
    u = np.clip((new_points - lo) / sz, 0.0, 1.0)      # (P, dim) in [0,1]

    was_1d = values.ndim == 1
    values = np.atleast_2d(values)
    cellv = values[..., mesh_old.cells]                # (..., E, 2^dim)

    # dense finest-resolution lookup: finest cell -> covering leaf.  Leaves
    # partition the domain, so this reproduces the per-point coarse-to-fine
    # search exactly, fully vectorized.  Memory is bounded by the forest
    # depth (R^dim int32; golden AMR: 64^2).
    grid = np.full((R,) * dim, -1, dtype=np.int32)
    levels = np.empty(len(leaves), dtype=np.int64)
    for i, leaf in enumerate(leaves):
        l, idx = leaf[0], leaf[1:]
        s = R >> l
        block = tuple(slice(ix * s, (ix + 1) * s) for ix in idx)
        # leaf layout: axis 0 = x; grid uses the same axis order
        grid[block] = i
        levels[i] = l

    f = np.minimum((u * R).astype(np.int64), R - 1)     # (P, dim)
    c = grid[tuple(f[:, d] for d in range(dim))]        # (P,)
    if (c < 0).any():           # numerical edge case: nudge inward
        bad = np.flatnonzero(c < 0)[0]
        raise RuntimeError(f"point {new_points[bad]} not in any leaf")
    n = (1 << levels[c]).astype(np.float64)             # (P,)
    idx = np.minimum((u * n[:, None]).astype(np.int64),
                     (n[:, None] - 1).astype(np.int64))
    xi = u * n[:, None] - idx                           # (P, dim) in [0,1]

    # multilinear corner weights in lex corner order (x fastest): corner
    # j = sum_d bit_d 2^d, weight = prod_d (bit_d ? xi_d : 1-xi_d)
    w = np.ones((len(u), 1))
    for d in range(dim):
        wd = np.stack([1.0 - xi[:, d], xi[:, d]], axis=1)   # (P, 2)
        w = (wd[:, :, None] * w[:, None, :]).reshape(len(u), -1)
    out = np.einsum("...pv,pv->...p", cellv[..., c, :], w)
    return out[0] if was_1d else out
