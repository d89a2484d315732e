"""Matrix-free operator applies vs independent dense scipy assembly
(SURVEY §4 operator tier)."""

import numpy as np
import pytest

import jax.numpy as jnp

from poroelasticity_dealii_tpu.mesh import build_fe_space, hyper_rectangle
from poroelasticity_dealii_tpu.ops import dense
from poroelasticity_dealii_tpu.ops import operators as ops
from poroelasticity_dealii_tpu.ops.geometry import geometry_factors
from poroelasticity_dealii_tpu.ops.quadrature import gauss_tensor
from poroelasticity_dealii_tpu.ops.shape import shape_tables

LAM, MU = 1.7e9, 0.8e9


def _setup(dim):
    size = [3.0, 2.0] if dim == 2 else [3.0, 2.0, 1.5]
    m = hyper_rectangle(size, 2 if dim == 2 else 1)
    sp = build_fe_space(m, 1)
    su = build_fe_space(m, 2)
    return m, sp, su


@pytest.mark.parametrize("dim", [2, 3])
def test_mass_and_laplace_apply(dim):
    m, sp, _ = _setup(dim)
    M = dense.assemble_global(dense.mass_element_matrices(sp),
                              sp.cell_nodes, sp.n_nodes)
    L = dense.assemble_global(dense.laplace_element_matrices(sp),
                              sp.cell_nodes, sp.n_nodes)
    pts, wts = gauss_tensor(2, dim)
    jinv, jxw = geometry_factors(m.vertices[m.cells], pts, wts)
    jinv = jnp.transpose(jinv, (1, 2, 3, 0))
    jxw = jnp.transpose(jxw)
    psi, dpsi = shape_tables(1, dim, pts)
    x = np.random.default_rng(0).standard_normal(sp.n_nodes)
    conn = jnp.array(sp.cell_nodes.T)
    np.testing.assert_allclose(
        ops.apply_mass(jnp.array(x), conn, jnp.array(psi), jxw), M @ x,
        rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(
        ops.apply_laplace(jnp.array(x), conn, jnp.array(dpsi), jinv, jxw),
        L @ x, rtol=1e-12, atol=1e-10)
    # constants are in the Laplace null space; mass row sums = volume
    zero = ops.apply_laplace(jnp.ones(sp.n_nodes), conn, jnp.array(dpsi),
                             jinv, jxw)
    np.testing.assert_allclose(zero, 0.0, atol=1e-12)
    assert np.isclose(M.sum(), np.prod([3.0, 2.0] if dim == 2 else [3.0, 2.0, 1.5]))


@pytest.mark.parametrize("dim", [2, 3])
def test_elasticity_apply(dim):
    m, _, su = _setup(dim)
    conn_u = su.vector_cell_dofs(dim)
    K = dense.assemble_global(
        dense.elasticity_element_matrices(su, LAM, MU), conn_u,
        su.n_nodes * dim)
    pts, wts = gauss_tensor(3, dim)
    jinv, jxw = geometry_factors(m.vertices[m.cells], pts, wts)
    jinv = jnp.transpose(jinv, (1, 2, 3, 0))
    jxw = jnp.transpose(jxw)
    _, dpsi = shape_tables(2, dim, pts)
    x = np.random.default_rng(1).standard_normal(su.n_nodes * dim)
    y = ops.apply_elasticity(jnp.array(x), jnp.array(conn_u.T),
                             jnp.array(dpsi), jinv, jxw, LAM, MU)
    ref = K @ x
    np.testing.assert_allclose(y, ref, rtol=1e-11, atol=1e-6 * np.abs(ref).max())
    # rigid translations in the null space
    for c in range(dim):
        t = np.zeros(su.n_nodes * dim)
        t[c::dim] = 1.0
        z = ops.apply_elasticity(jnp.array(t), jnp.array(conn_u.T),
                                 jnp.array(dpsi), jinv, jxw, LAM, MU)
        assert np.abs(np.asarray(z)).max() < 1e-4  # ~1e-13 relative to LAM


@pytest.mark.parametrize("dim", [2, 3])
def test_diagonals(dim):
    m, sp, su = _setup(dim)
    conn_u = su.vector_cell_dofs(dim)
    K = dense.assemble_global(
        dense.elasticity_element_matrices(su, LAM, MU), conn_u,
        su.n_nodes * dim)
    M = dense.assemble_global(dense.mass_element_matrices(sp),
                              sp.cell_nodes, sp.n_nodes)
    ptsu, wtsu = gauss_tensor(3, dim)
    jinvu, jxwu = geometry_factors(m.vertices[m.cells], ptsu, wtsu)
    jinvu = jnp.transpose(jinvu, (1, 2, 3, 0))
    jxwu = jnp.transpose(jxwu)
    _, dpsu = shape_tables(2, dim, ptsu)
    dK = ops.elasticity_diagonal(jnp.array(conn_u.T), jnp.array(dpsu), jinvu,
                                 jxwu, LAM, MU, su.n_nodes * dim)
    np.testing.assert_allclose(dK, K.diagonal(), rtol=1e-12)
    pts, wts = gauss_tensor(2, dim)
    jinv, jxw = geometry_factors(m.vertices[m.cells], pts, wts)
    jinv = jnp.transpose(jinv, (1, 2, 3, 0))
    jxw = jnp.transpose(jxw)
    psi, _ = shape_tables(1, dim, pts)
    dM = ops.mass_diagonal(jnp.array(sp.cell_nodes.T), jnp.array(psi), jxw,
                           sp.n_nodes)
    np.testing.assert_allclose(dM, M.diagonal(), rtol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_strain_projection_rhs(dim):
    """rhs_c[i] = ∫ psi_i eps_c(u) dx — verified against dense quadrature
    for a linear displacement field with known constant strain."""
    m, sp, su = _setup(dim)
    conn_u = jnp.array(su.vector_cell_dofs(dim).T)
    conn_p = jnp.array(sp.cell_nodes.T)
    pts, wts = gauss_tensor(2, dim)
    jinv_p, jxw_p = geometry_factors(m.vertices[m.cells], pts, wts)
    jinv_p = jnp.transpose(jinv_p, (1, 2, 3, 0))
    jxw_p = jnp.transpose(jxw_p)
    psi_p, _ = shape_tables(1, dim, pts)
    _, dref_u = shape_tables(2, dim, pts)
    # u(x) = A x with A random -> eps = sym(A) constant
    A = np.random.default_rng(2).standard_normal((dim, dim)) * 1e-3
    u = (su.node_coords @ A.T).reshape(-1)
    rhs = ops.strain_projection_rhs(jnp.array(u), conn_u, conn_p,
                                    jnp.array(psi_p), jnp.array(dref_u),
                                    jinv_p, jxw_p, sp.n_nodes)
    eps = 0.5 * (A + A.T)
    M = dense.assemble_global(dense.mass_element_matrices(sp),
                              sp.cell_nodes, sp.n_nodes)
    ones = np.ones(sp.n_nodes)
    for c, (i, j) in enumerate(ops.VOIGT_PAIRS[dim]):
        # ∫ psi_i eps_c dx = eps_c * (M @ 1)
        np.testing.assert_allclose(rhs[c], eps[i, j] * (M @ ones),
                                   rtol=1e-10, atol=1e-15)


def test_constrained_apply_identity_on_fixed():
    n = 10
    free = jnp.array([1.0] * 7 + [0.0] * 3)
    apply = ops.constrained_apply(lambda x: 2.0 * x, free)
    x = jnp.arange(n, dtype=jnp.float64)
    y = apply(x)
    np.testing.assert_allclose(y[:7], 2.0 * x[:7])
    np.testing.assert_allclose(y[7:], x[7:])
