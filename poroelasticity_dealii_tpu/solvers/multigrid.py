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


def _parity_embedding_matrices(dim: int):
    """Q2 embedding split per fine-subcell parity.

    Returns ``E_s`` of shape ``(2^dim, 3^dim*dim, 3^dim*dim)``:
    for fine cell ``2c+s`` inside coarse cell ``c``, local fine-node values
    = ``E_s @`` coarse-cell local values.  (The single-conv 5-window/
    dilation-4 formulation tickles an XLA-TPU space_to_batch compiler
    crash; this parity split keeps every conv at the well-tested
    3-window/stride-2 shape.)
    """
    lat = node_lattice(2, dim).astype(np.float64) / 2.0   # in [0,1]
    mats = []
    for s in range(2 ** dim):
        bits = [(s >> d) & 1 for d in range(dim)]
        pts = np.stack([(bits[d] + lat[:, d]) / 2.0 for d in range(dim)],
                       axis=-1) * 2.0 - 1.0
        phi, _ = shape_tables(2, dim, pts)                # (3^d, 3^d)
        nf, nc = phi.shape
        E = np.zeros((nf * dim, nc * dim))
        for i in range(dim):
            E[i::dim, i::dim] = phi
        mats.append(E)
    return np.stack(mats)


def _deinterleave_parities(v, dim: int, nc: int):
    """(CH, (2nc)^dim) fine-cell array -> (2^dim, CH, nc^dim) per parity."""
    ch = v.shape[0]
    w = v.reshape((ch,) + tuple(x for _ in range(dim) for x in (nc, 2)))
    perm = [2 * d + 2 for d in range(dim)] + [0] \
        + [2 * d + 1 for d in range(dim)]
    w = w.transpose(perm)
    return w.reshape(2 ** dim, ch, nc ** dim)


def _interleave_parities(vals, dim: int, nc: int):
    """(2^dim, CH, nc^dim) per-parity cell arrays -> (CH, (2nc)^dim).

    Parity s bits are per-axis (x = bit 0); cell arrays are x-fastest.
    """
    ch = vals.shape[1]
    v = vals.reshape((2,) * dim + (ch,) + (nc,) * dim)
    # v[s_z.., ch, cz..]: interleave axis pairs -> (ch, nc,2, nc,2, ...)
    # target fine index along axis d: 2*c_d + s_d
    # bring each parity axis next to its cell axis
    # parity axes: 0..dim-1 ordered (x=axis dim-1 ... wait: s bits d=x..)
    # s index decomposed C-order: first axis = most significant bit = z
    perm = [dim]  # channel axis first
    for d in range(dim):           # spatial z..x
        cell_axis = dim + 1 + d
        parity_axis = d            # z-parity is axis 0 (most significant)
        perm += [cell_axis, parity_axis]
    v = v.transpose(perm)
    return v.reshape(ch, *((2 * nc,) * dim))


def build_gmg_elasticity(data: InputData, n_fine: int, n_levels: int,
                         dtype, displacement_degree: int = 2,
                         smoother_degree: int = 3,
                         lower=None, upper=None,
                         smoother_precision=None):
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

    E = _parity_embedding_matrices(dim)

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
        import jax.lax as lax
        prec = smoother_precision or lax.Precision.HIGHEST
        raw = make_stencil_apply(Ke, 2, 2, dim, dim, dim, n, dtype,
                                 precision=prec)
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
            nf = 2 * nc
            from ..ops.stencil import (_scatter_kernel, _to_kernel,
                                       conv_cellwise, conv_scatter)
            n_local = (3 ** dim) * dim
            ident_k = jnp.asarray(
                _to_kernel(np.eye(n_local), dim, 2, dim), dtype)
            scat_f = jnp.asarray(
                _scatter_kernel(dim, 3 ** dim, dim, 2, dim), dtype)
            scat_c = scat_f
            Es = jnp.asarray(E, dtype)            # (2^dim, n_local, n_local)
            g_c, g_f = 2 * nc + 1, 2 * nf + 1

            def raw_p(xc, _Es=Es, _ik=ident_k, _sf=scat_f, _nc=nc, _nf=nf,
                      _gc=g_c):
                uc = conv_cellwise(xc, _ik, 2, dim, dim, _gc)  # (NL, nc^d)
                ye = jnp.einsum("sab,bE->saE", _Es, uc)
                ye_f = _interleave_parities(ye, dim, _nc)
                return conv_scatter(ye_f.reshape(ye.shape[1], -1), _sf, 2,
                                    dim, dim, _nf)

            mult = raw_p(jnp.ones((u_space.n_nodes * dim,), dtype))
            inv_mult = 1.0 / mult

            def raw_r(yf, _Es=Es, _ik=ident_k, _sc=scat_c, _nc=nc, _nf=nf):
                ye_f = conv_cellwise(yf, _ik, 2, dim, dim, 2 * _nf + 1)
                ye = _deinterleave_parities(ye_f, dim, _nc)
                zc = jnp.einsum("sab,saE->bE", _Es, ye)
                return conv_scatter(zc, _sc, 2, dim, dim, _nc)

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
