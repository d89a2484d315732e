"""Distorted / unstructured mesh validation (round-2 verdict item 3).

The one deal.II-native capability (arbitrary straight-edged quad/hex
geometry, ``GridIn::read_msh`` + per-cell mappings,
``PoroelasticityFSS.h:439-445``) the generic path implements via
per-element per-quad-point Jacobians (``solvers/discretization.py``) but
round 2 never exercised off a regular grid.  Tiers:

* patch tests on randomly perturbed meshes (2D + 3D): interior rows of
  L @ (linear field) and K @ (linear displacement) vanish at machine
  precision — an oracle-free correctness check of the distorted-geometry
  quadrature (exact for straight-edged bi/trilinear cells at the used
  Gauss orders);
* generic matrix-free applies == dense scipy assembly on the same
  perturbed meshes (machine precision);
* total mass = independently computed (shoelace) domain area in 2D;
* Terzaghi on a distorted column within the regular-mesh L2 bound;
* end-to-end FSS steps on the committed genuinely irregular gmsh asset
  (``configs/irregular_2d.msh``) driven by its deck.
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import (build_fe_space, hyper_rectangle,
                                            read_msh)
from poroelasticity_dealii_tpu.mesh.generator import perturb_interior
from poroelasticity_dealii_tpu.ops import dense
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

GOLDEN = "configs/golden_2d.data"


def _perturbed(dim, level=None, cells=None, amplitude=0.22, seed=3):
    size = [10.0, 10.0] if dim == 2 else [10.0, 10.0, 10.0]
    m = hyper_rectangle(size, refinement_level=level, cells_per_axis=cells)
    return perturb_interior(m, amplitude, seed=seed)


@pytest.mark.parametrize("dim", [2, 3])
def test_perturbation_moves_interior_fixes_boundary(dim):
    size = [10.0, 10.0] if dim == 2 else [10.0, 10.0, 10.0]
    m0 = hyper_rectangle(size, cells_per_axis=4)
    m = perturb_interior(m0, 0.2, seed=1)
    moved = np.linalg.norm(m.vertices - m0.vertices, axis=1)
    lo, hi = m0.vertices.min(0), m0.vertices.max(0)
    on_b = np.zeros(m0.n_vertices, bool)
    for d in range(dim):
        on_b |= np.isclose(m0.vertices[:, d], lo[d]) \
            | np.isclose(m0.vertices[:, d], hi[d])
    assert moved[on_b].max() == 0.0
    assert (moved[~on_b] > 0).all()


@pytest.mark.parametrize("dim", [2, 3])
def test_patch_tests_on_perturbed_mesh(dim):
    """Interior rows of L @ u_lin and K @ u_lin vanish on distorted
    meshes: the quadrature integrates the bilinear/trilinear-mapped
    gradients of a linear field exactly, so any geometry bug shows up at
    full magnitude."""
    m = _perturbed(dim, cells=3 if dim == 3 else 5)
    data = read_input_file(GOLDEN)
    if dim == 3:
        data = dataclasses.replace(
            data, dim=3, domain_size=(10.0, 10.0, 10.0),
            displacement_boundary_labels=(0, 1, 2, 3, 4, 5),
            displacement_boundary_components=(0, 0, 1, 1, 2, 2),
            displacement_boundary_values=(0, -1e-5, 0, -1e-5, 0, -1e-5))
    disc = build_discretization(m, data)
    sp, su = disc.pressure_space, disc.displacement_space

    # pressure Laplace: u_lin = a + b.x on Q1 nodes
    b = np.arange(1, dim + 1, dtype=np.float64)
    p_lin = 2.0 + sp.node_coords @ b
    y = np.asarray(disc.laplace(jnp.asarray(p_lin)))
    scale = np.abs(y).max() + 1e-30
    lo, hi = m.vertices.min(0), m.vertices.max(0)
    int_p = np.ones(sp.n_nodes, bool)
    for d in range(dim):
        int_p &= ~np.isclose(sp.node_coords[:, d], lo[d])
        int_p &= ~np.isclose(sp.node_coords[:, d], hi[d])
    assert np.abs(y[int_p]).max() < 1e-12 * scale

    # elasticity: linear displacement -> constant strain patch test
    B = np.arange(1, dim * dim + 1, dtype=np.float64).reshape(dim, dim)
    u_lin = (su.node_coords @ B.T).reshape(-1)      # interleaved comps
    yk = np.asarray(disc.elasticity(jnp.asarray(u_lin)))
    int_u = np.ones(su.n_nodes, bool)
    for d in range(dim):
        int_u &= ~np.isclose(su.node_coords[:, d], lo[d])
        int_u &= ~np.isclose(su.node_coords[:, d], hi[d])
    int_udof = np.repeat(int_u, dim)
    assert np.abs(yk[int_udof]).max() < 1e-11 * np.abs(yk).max()


@pytest.mark.parametrize("dim", [2, 3])
def test_operators_match_dense_oracle_on_perturbed(dim):
    """Matrix-free applies == scipy assembled-sparse matvec on distorted
    meshes (independent assembly route; machine precision)."""
    m = _perturbed(dim, cells=3 if dim == 3 else 4, amplitude=0.25, seed=11)
    data = read_input_file(GOLDEN)
    if dim == 3:
        data = dataclasses.replace(data, dim=3,
                                   domain_size=(10.0, 10.0, 10.0))
    disc = build_discretization(m, data)
    sp, su = disc.pressure_space, disc.displacement_space
    rng = np.random.default_rng(0)
    x_p = rng.standard_normal(sp.n_nodes)
    x_u = rng.standard_normal(su.n_nodes * dim)

    M = dense.assemble_global(dense.mass_element_matrices(sp),
                              sp.cell_nodes, sp.n_nodes)
    L = dense.assemble_global(dense.laplace_element_matrices(sp),
                              sp.cell_nodes, sp.n_nodes)
    K = dense.assemble_global(
        dense.elasticity_element_matrices(su, data.lame_constant,
                                          data.shear_modulus),
        su.vector_cell_dofs(dim), su.n_nodes * dim)
    np.testing.assert_allclose(np.asarray(disc.mass(jnp.asarray(x_p))),
                               M @ x_p, rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(np.asarray(disc.laplace(jnp.asarray(x_p))),
                               L @ x_p, rtol=1e-12, atol=1e-11)
    yk = K @ x_u
    np.testing.assert_allclose(np.asarray(disc.elasticity(jnp.asarray(x_u))),
                               yk, rtol=1e-11,
                               atol=1e-11 * np.abs(yk).max())
    # 2D: total mass == shoelace area (independent geometric formula)
    if dim == 2:
        c = m.vertices[m.cells][:, [0, 1, 3, 2], :]  # ccw corner order
        x, y = c[..., 0], c[..., 1]
        area = 0.5 * np.abs(np.sum(
            x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y))
        assert np.isclose(float(M.sum()), area, rtol=1e-12)


def test_terzaghi_on_distorted_column():
    """Same Terzaghi L2 bound as the regular-mesh test after perturbing
    interior nodes (the analytic solution depends only on depth, so
    distortion-induced error must stay at the discretization level)."""
    from poroelasticity_dealii_tpu.models.terzaghi import (
        consolidation_coefficient, terzaghi_config, terzaghi_pressure)
    data = terzaghi_config(level=4, dt=25.0, resync=True)
    mesh = hyper_rectangle(data.domain_size, data.initial_refinement_level)
    mesh = perturb_interior(mesh, 0.18, seed=5)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    for _ in range(10):
        st, stats = solver.time_step(st, data.time_step)
    cv = consolidation_coefficient(data)
    coords = disc.pressure_space.node_coords
    z = 10.0 / 2 - coords[:, 1]
    p_ana = terzaghi_pressure(z, 250.0, cv, 10.0, 1e5)
    err = np.linalg.norm(np.asarray(st.p) - p_ana) / np.linalg.norm(p_ana)
    # regular-mesh bound is 0.03 (test_terzaghi.py); allow the distortion
    # a modest constant on top of the same order
    assert err < 0.04, err


def test_irregular_gmsh_end_to_end():
    """The committed genuinely irregular mesh runs the coupled solver:
    read -> generic discretization -> 3 FSS steps, converged and finite,
    with pressure physically bounded by the well drawdown problem."""
    data = read_input_file("configs/irregular_2d.data")
    assert data.mesh_file.endswith("irregular_2d.msh")
    mesh = read_msh(data.mesh_file, dim=2)
    # the asset is genuinely irregular: nearly all cells non-rectangular
    c = mesh.vertices[mesh.cells]
    e1 = c[:, 1] - c[:, 0]
    e2 = c[:, 2] - c[:, 0]
    rect = (np.abs(e1[:, 1]) < 1e-12) & (np.abs(e2[:, 0]) < 1e-12)
    assert rect.sum() < 0.05 * mesh.n_cells
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    for _ in range(3):
        st, stats = solver.time_step(st, data.time_step)
    assert np.isfinite(float(stats.pressure_error))
    assert float(stats.pressure_error) <= data.fss_tol
    p = np.asarray(st.p)
    assert np.isfinite(p).all()
    assert p.min() > 0.9e7 and p.max() < 1.3e7   # same regime as golden
    u = np.asarray(st.u)
    assert np.abs(u).max() < 5e-5


def test_irregular_3d_gmsh_end_to_end():
    """The committed irregular 3D HEX mesh (graded + warped + jittered,
    scripts/make_irregular_msh.py --3d) runs the coupled solver through
    the generic per-element-Jacobian path: read -> FSS steps, converged,
    finite, physically bounded."""
    data = read_input_file("configs/consolidation_3d.data")
    mesh = read_msh("configs/irregular_3d.msh", dim=3)
    assert mesh.n_cells == 210
    # irregularity: most cells are not axis-aligned boxes
    c = mesh.vertices[mesh.cells]
    e1 = c[:, 1] - c[:, 0]
    box = (np.abs(e1[:, 1]) < 1e-12) & (np.abs(e1[:, 2]) < 1e-12)
    assert box.sum() < 0.5 * mesh.n_cells
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    for _ in range(2):
        st, stats = solver.time_step(st, data.time_step)
    assert np.isfinite(float(stats.pressure_error))
    assert float(stats.pressure_error) <= data.fss_tol
    p = np.asarray(st.p)
    assert np.isfinite(p).all() and p.min() > 0.9e7 and p.max() < 1.3e7
