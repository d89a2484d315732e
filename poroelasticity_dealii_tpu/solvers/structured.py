"""Structured-grid discretization: the gather/scatter-free fast path.

Same :class:`~.discretization.Discretization` interface (so the
FixedStressSolver runs unchanged), but on a uniform structured mesh:

* grid-lexicographic node numbering (mesh/structured.py),
* operator applies through strided-slice gather + interior-pad scatter
  (ops/structured.py) — no XLA gather/scatter instructions,
* constant-Jacobian geometry stored once and broadcast over cells — the
  apply streams essentially only the dof vector.

This is the path the 1M-DOF benchmark configs use; gmsh meshes fall back to
the generic path.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ..config import InputData
from ..mesh.structured import (GridInfo, build_structured_space,
                               structured_mesh)
from ..ops import operators as ops
from ..ops.quadrature import gauss_tensor
from ..ops.shape import shape_tables
from ..ops.structured import (grid_gather, grid_scatter,
                              uniform_geometry_factors)
from .discretization import (Discretization, _dirichlet_constraints,
                             _neumann_vector, _pressure_dirichlet,
                             _well_vector)


@dataclasses.dataclass
class GridDiscretization(Discretization):
    """Discretization with structured strided-slice operator closures."""

    info_p: GridInfo = None
    info_u: GridInfo = None

    def mass(self, p):
        pe = grid_gather(p, self.info_p, 1)[:, 0, :]
        return grid_scatter(ops.mass_core(pe, self.psi_p_at_pq, self.jxw_p),
                            self.info_p, 1)

    def laplace(self, p):
        pe = grid_gather(p, self.info_p, 1)[:, 0, :]
        ye = ops.laplace_core(pe, self.dref_p_at_pq, self.jinv_p, self.jxw_p)
        return grid_scatter(ye, self.info_p, 1)

    def elasticity(self, u):
        ue = grid_gather(u, self.info_u, self.dim)
        ye = ops.elasticity_core(ue, self.dref_u_at_uq, self.jinv_u,
                                 self.jxw_u, self.lam, self.mu)
        return grid_scatter(ye, self.info_u, self.dim)

    def coupling_rhs(self, p, biot_coef):
        pe = grid_gather(p, self.info_p, 1)[:, 0, :]
        ye = ops.coupling_core(pe, self.psi_p_at_uq, self.dref_u_at_uq,
                               self.jinv_u, self.jxw_u, biot_coef)
        return grid_scatter(ye, self.info_u, self.dim)

    def strain_projection_rhs(self, u):
        import jax
        ue = grid_gather(u, self.info_u, self.dim)
        ye = ops.projection_core(ue, self.psi_p_at_pq, self.dref_u_at_pq,
                                 self.jinv_p, self.jxw_p)     # (Np, C, E)
        return jax.vmap(lambda y: grid_scatter(y, self.info_p, 1),
                        in_axes=1, out_axes=0)(ye)


def build_grid_discretization(data: InputData,
                              cells_per_axis: Optional[int] = None,
                              pressure_degree: int = 1,
                              displacement_degree: int = 2,
                              dtype=None,
                              lower=None, upper=None) -> GridDiscretization:
    dim = data.dim
    if cells_per_axis is None:
        cells_per_axis = 2 ** data.initial_refinement_level
    if dtype is None:
        dtype = np.float64 if data.dtype == "float64" else np.float32
    dtype = np.dtype(dtype)

    mesh = structured_mesh(data.domain_size[:dim], cells_per_axis,
                           lower=lower, upper=upper)
    p_space, info_p = build_structured_space(mesh, cells_per_axis,
                                             pressure_degree)
    u_space, info_u = build_structured_space(mesh, cells_per_axis,
                                             displacement_degree)

    pq_pts, pq_wts = gauss_tensor(pressure_degree + 1, dim)
    uq_pts, uq_wts = gauss_tensor(displacement_degree + 1, dim)
    jinv_p, jxw_p = uniform_geometry_factors(mesh.vertices, cells_per_axis,
                                             pq_pts, pq_wts)
    jinv_u, jxw_u = uniform_geometry_factors(mesh.vertices, cells_per_axis,
                                             uq_pts, uq_wts)

    psi_p_at_pq, dref_p_at_pq = shape_tables(pressure_degree, dim, pq_pts)
    psi_p_at_uq, _ = shape_tables(pressure_degree, dim, uq_pts)
    _, dref_u_at_uq = shape_tables(displacement_degree, dim, uq_pts)
    _, dref_u_at_pq = shape_tables(displacement_degree, dim, pq_pts)

    conn_p = np.ascontiguousarray(p_space.cell_nodes.T)
    conn_u = np.ascontiguousarray(u_space.vector_cell_dofs(dim).T)

    # physical coordinates of pressure quadrature points (for the well)
    n1_at_pq, _ = shape_tables(1, dim, pq_pts)
    corner_xyz = mesh.vertices[mesh.cells]
    x_q = np.einsum("qv,evd->eqd", n1_at_pq, corner_xyz)
    jxw_p_full = np.broadcast_to(jxw_p.T, (mesh.n_cells, jxw_p.shape[0]))

    f_well = _well_vector(p_space, data, jxw_p_full, psi_p_at_pq, x_q)
    f_neumann = _neumann_vector(mesh, u_space, data)
    free_np, dirichlet_np = _dirichlet_constraints(mesh, u_space, data)
    free_p_np, dirichlet_p_np = _pressure_dirichlet(mesh, p_space, data)

    lam, mu = data.lame_constant, data.shear_modulus
    jp = lambda a: jnp.asarray(np.asarray(a), dtype=dtype)  # noqa: E731

    d = GridDiscretization(
        dim=dim, dtype=jnp.dtype(dtype),
        pressure_space=p_space, displacement_space=u_space,
        conn_p=jnp.asarray(conn_p), conn_u=jnp.asarray(conn_u),
        psi_p_at_pq=jp(psi_p_at_pq), dref_p_at_pq=jp(dref_p_at_pq),
        psi_p_at_uq=jp(psi_p_at_uq), dref_u_at_uq=jp(dref_u_at_uq),
        dref_u_at_pq=jp(dref_u_at_pq),
        jinv_u=jp(jinv_u), jxw_u=jp(jxw_u),
        jinv_p=jp(jinv_p), jxw_p=jp(jxw_p),
        free_mask_u=jp(free_np.astype(np.float64)),
        dirichlet_values=jp(dirichlet_np),
        f_neumann=jp(f_neumann), f_well=jp(f_well),
        free_mask_p=jp(free_p_np.astype(np.float64)),
        dirichlet_values_p=jp(dirichlet_p_np),
        diag_mass=jnp.zeros(p_space.n_nodes, dtype),
        diag_laplace=jnp.zeros(p_space.n_nodes, dtype),
        diag_elasticity=jnp.ones(u_space.n_nodes * dim, dtype),
        lam=lam, mu=mu,
        info_p=info_p, info_u=info_u,
    )
    diag_mass = ops.mass_diagonal(d.conn_p, d.psi_p_at_pq, d.jxw_p,
                                  d.n_pdofs)
    diag_lap = ops.laplace_diagonal(d.conn_p, d.dref_p_at_pq, d.jinv_p,
                                    d.jxw_p, d.n_pdofs)
    diag_el = ops.elasticity_diagonal(d.conn_u, d.dref_u_at_uq, d.jinv_u,
                                      d.jxw_u, lam, mu, d.n_udofs)
    diag_el = jnp.where(d.free_mask_u > 0, diag_el, jnp.ones((), dtype))
    return dataclasses.replace(d, diag_mass=diag_mass, diag_laplace=diag_lap,
                               diag_elasticity=diag_el)
