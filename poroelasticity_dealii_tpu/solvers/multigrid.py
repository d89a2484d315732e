"""Geometric multigrid preconditioner for the structured elasticity solve.

The reference preconditions its elasticity CG with SSOR
(``PoroElasticDisplacementSolver.h:302``) — a sequential sweep that cannot
vectorize.  The TPU-native answer at scale is a geometric V-cycle over the
structured grid hierarchy:

* every level's operator is the same two-conv stencil apply (ops/stencil.py)
  with the level's (uniform) element matrix and Dirichlet mask;
* smoothers are Chebyshev-accelerated Jacobi (pure applies, no dot products
  — fully parallel, and a *fixed* polynomial, so the V-cycle is a fixed SPD
  linear operator, legal as a CG preconditioner);
* grid transfers are the Q2 finite-element embedding, expressed with the
  same conv machinery (gather over coarse cells -> 125x27 local embedding
  matrix -> one-hot scatter on the fine grid), with exact boundary handling
  via a multiplicity normalization;
* the coarsest level is solved exactly with a precomputed dense inverse.

Requires the fine cell count divisible by 2**(n_levels-1).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, List

import numpy as np

import jax
import jax.numpy as jnp

from ..config import InputData
from ..mesh.structured import build_structured_space, structured_mesh
from ..ops import dense
from ..ops.shape import node_lattice, shape_tables
from ..ops.stencil import make_stencil_apply
from .discretization import _dirichlet_constraints
from ..ops import operators as ops


# ---------------------------------------------------------------------------
# Chebyshev-Jacobi smoother (fixed polynomial in D^{-1} A)
# ---------------------------------------------------------------------------

def chebyshev_smooth(apply_a: Callable, inv_diag, b, degree: int,
                     lmax: float, lmin: float):
    """Approximate A^{-1} b by a degree-``degree`` Chebyshev polynomial of
    the Jacobi-preconditioned operator, targeting the spectrum
    [lmin, lmax] of D^{-1}A.  Starts from x = 0."""
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta
    rho = 1.0 / sigma
    x = inv_diag * b / theta
    r = b - apply_a(x)
    p = x
    for _ in range(degree - 1):
        rho_new = 1.0 / (2.0 * sigma - rho)
        p = (rho_new * rho) * p + (2.0 * rho_new / delta) * (inv_diag * r)
        x = x + p
        r = b - apply_a(x)
        rho = rho_new
    return x


def estimate_lmax(apply_a: Callable, inv_diag, n: int, dtype,
                  iters: int = 20, seed: int = 0) -> float:
    """Power iteration on D^{-1}A (run once at setup, on device)."""
    key = jax.random.PRNGKey(seed)
    v = jax.random.normal(key, (n,), dtype)
    v = v / jnp.linalg.norm(v)

    def body(_, v):
        w = inv_diag * apply_a(v)
        return w / jnp.linalg.norm(w)

    v = jax.lax.fori_loop(0, iters, body, v)
    w = inv_diag * apply_a(v)
    return float(jnp.vdot(v, w) / jnp.vdot(v, v))


# ---------------------------------------------------------------------------
# level construction
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class _Level:
    n_cells: int
    apply: Callable            # Dirichlet-masked elasticity apply
    inv_diag: jnp.ndarray
    free_mask: jnp.ndarray
    lmax: float
    prolong: Callable = None   # from next-coarser level to this one
    restrict: Callable = None  # from this level to next-coarser


def _embedding_matrix(dim: int, dtype):
    """Q2 coarse-cell -> fine-nodes embedding E ((5^d*dim), (3^d*dim))."""
    lat_f = node_lattice(4, dim).astype(np.float64) / 4.0 * 2.0 - 1.0
    phi, _ = shape_tables(2, dim, lat_f)          # (5^d, 3^d)
    nf, nc = phi.shape
    E = np.zeros((nf * dim, nc * dim))
    for i in range(dim):
        E[i::dim, i::dim] = phi
    return E


def build_gmg_elasticity(data: InputData, n_fine: int, n_levels: int,
                         dtype, displacement_degree: int = 2,
                         smoother_degree: int = 3,
                         lower=None, upper=None):
    """Build a V-cycle preconditioner for the Dirichlet-masked elasticity
    operator on an ``n_fine``-cells-per-axis structured grid.

    Returns ``precond(r) -> z`` (a fixed SPD linear operator).
    """
    if displacement_degree != 2:
        raise NotImplementedError("GMG transfer assumes Q2 displacement")
    dim = data.dim
    lam, mu = data.lame_constant, data.shear_modulus
    sizes = [n_fine // (2 ** l) for l in range(n_levels)]
    for l, s in enumerate(sizes[1:], 1):
        if s * (2 ** l) != n_fine:
            raise ValueError(f"n_fine={n_fine} not divisible for level {l}")

    E = _embedding_matrix(dim, np.float64)

    levels: List[_Level] = []
    coarse_space = None
    for l, n in enumerate(sizes):
        mesh = structured_mesh(data.domain_size[:dim], n,
                               lower=lower, upper=upper)
        u_space, _ = build_structured_space(mesh, n, 2)
        free_np, _ = _dirichlet_constraints(mesh, u_space, data)
        free = jnp.asarray(free_np.astype(np.float64), dtype)
        # element matrix of this level's (uniform) cell
        h = [data.domain_size[d] / n for d in range(dim)]
        from ..mesh.generator import hyper_rectangle
        from ..mesh.qk import build_fe_space
        cell_mesh = hyper_rectangle(h, cells_per_axis=1)
        su1 = build_fe_space(cell_mesh, 2)
        Ke = dense.elasticity_element_matrices(su1, lam, mu)[0]
        raw = make_stencil_apply(Ke, 2, 2, dim, dim, dim, n, dtype)
        apply = ops.constrained_apply(raw, free)
        # diagonal via the generic scatter (setup-only)
        conn_u = jnp.asarray(
            np.ascontiguousarray(u_space.vector_cell_dofs(dim).T))
        from ..ops.quadrature import gauss_tensor
        from ..ops.geometry import geometry_factors
        pts, wts = gauss_tensor(3, dim)
        jinv, jxw = geometry_factors(cell_mesh.vertices[cell_mesh.cells],
                                     pts, wts)
        jinv_t = jnp.asarray(np.transpose(np.asarray(jinv), (1, 2, 3, 0)),
                             dtype)
        jxw_t = jnp.asarray(np.asarray(jxw).T, dtype)
        diag = ops.elasticity_diagonal(conn_u, jnp.asarray(
            shape_tables(2, dim, pts)[1], dtype), jinv_t, jxw_t, lam, mu,
            u_space.n_nodes * dim)
        diag = jnp.where(free > 0, diag, jnp.ones((), dtype))
        inv_diag = 1.0 / diag
        lmax = estimate_lmax(apply, inv_diag, u_space.n_nodes * dim, dtype)
        levels.append(_Level(n_cells=n, apply=apply, inv_diag=inv_diag,
                             free_mask=free, lmax=lmax * 1.1))
        coarse_space = u_space
        if l > 0:
            nc = n  # this level IS the coarser one of the pair (l-1, l)
            raw_p = make_stencil_apply(E, 2, 4, dim, dim, dim, nc, dtype)
            mult = raw_p(jnp.ones((u_space.n_nodes * dim,), dtype))
            inv_mult = 1.0 / mult
            raw_r = make_stencil_apply(E.T, 4, 2, dim, dim, dim, nc, dtype)
            fine_free = levels[l - 1].free_mask
            coarse_free = free

            # P = diag(ff * 1/mult) raw_p diag(cf);  R = P^T exactly
            def prolong(xc, _rp=raw_p, _im=inv_mult, _ff=fine_free,
                        _cf=coarse_free):
                return _rp(xc * _cf) * _im * _ff

            def restrict(rf, _rr=raw_r, _im=inv_mult, _ff=fine_free,
                         _cf=coarse_free):
                return _rr(rf * _im * _ff) * _cf

            levels[l - 1].prolong = prolong
            levels[l - 1].restrict = restrict

    # coarsest: dense inverse of the masked operator (host, float64)
    mesh_c = structured_mesh(data.domain_size[:dim], sizes[-1],
                             lower=lower, upper=upper)
    space_c, _ = build_structured_space(mesh_c, sizes[-1], 2)
    conn_c = space_c.vector_cell_dofs(dim)
    Kg = dense.assemble_global(
        dense.elasticity_element_matrices(space_c, lam, mu), conn_c,
        space_c.n_nodes * dim).toarray()
    free_c, _ = _dirichlet_constraints(mesh_c, space_c, data)
    Kg[~free_c, :] = 0.0
    Kg[:, ~free_c] = 0.0
    Kg[~free_c, ~free_c] = 1.0
    coarse_inv = jnp.asarray(np.linalg.inv(Kg), dtype)

    def coarse_solve(r):
        return coarse_inv @ r

    deg = smoother_degree

    def vcycle(l, r):
        lev = levels[l]
        if l == len(levels) - 1:
            return coarse_solve(r)
        lmin = lev.lmax / 8.0   # smooth the upper spectrum only
        x = chebyshev_smooth(lev.apply, lev.inv_diag, r, deg, lev.lmax, lmin)
        rc = lev.restrict(r - lev.apply(x))
        x = x + lev.prolong(vcycle(l + 1, rc))
        x = x + chebyshev_smooth(lev.apply, lev.inv_diag, r - lev.apply(x),
                                 deg, lev.lmax, lmin)
        return x

    def precond(r):
        return vcycle(0, r)

    return precond, levels
