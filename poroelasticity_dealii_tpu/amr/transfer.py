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
    leaf_index = {leaf: i for i, leaf in enumerate(leaves)}
    Lmax = forest_old.max_level
    lo = forest_old.lower
    sz = forest_old.upper - forest_old.lower
    u = np.clip((new_points - lo) / sz, 0.0, 1.0)      # (P, dim) in [0,1]

    was_1d = values.ndim == 1
    values = np.atleast_2d(values)
    out = np.zeros(values.shape[:-1] + (len(new_points),))
    cellv = values[..., mesh_old.cells]                # (..., E, 2^dim)

    for pidx in range(len(new_points)):
        up = u[pidx]
        found = None
        for l in range(Lmax, -1, -1):
            n = 2 ** l
            idx = tuple(min(int(up[d] * n), n - 1) for d in range(dim))
            leaf = (l,) + idx
            if leaf in leaf_index:
                found = (leaf_index[leaf], l, idx)
                break
        if found is None:       # numerical edge case: nudge inward
            raise RuntimeError(f"point {new_points[pidx]} not in any leaf")
        c, l, idx = found
        n = 2 ** l
        xi = [up[d] * n - idx[d] for d in range(dim)]
        # multilinear corner weights in lex corner order (x fastest): each
        # new axis becomes the slowest index
        w = np.array([1.0])
        for d in range(dim):
            w = np.outer([1 - xi[d], xi[d]], w).reshape(-1)
        out[..., pidx] = np.einsum("...v,v->...", cellv[..., c, :], w)
    return out[0] if was_1d else out
