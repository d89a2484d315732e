"""Geometric multigrid: V-cycle preconditioned CG vs Jacobi for both the
elasticity and pressure operators."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.solvers.cg import cg_solve
from poroelasticity_dealii_tpu.solvers.multigrid import (
    build_gmg_elasticity, build_gmg_pressure)
from poroelasticity_dealii_tpu.solvers.structured import \
    build_grid_discretization

DECK3D = "configs/consolidation_3d.data"
GOLDEN = "configs/golden_2d.data"


def test_gmg_elasticity_cuts_iterations_3d():
    data = read_input_file(DECK3D)
    n = 8
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    precond, levels = build_gmg_elasticity(data, n_fine=n, n_levels=2,
                                           dtype=np.float64)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(disc.n_udofs)) * disc.free_mask_u
    tol = 1e-9 * float(jnp.linalg.norm(b))
    r_j = cg_solve(disc.elasticity_constrained, b, jnp.zeros_like(b),
                   diag=disc.diag_elasticity, tol=tol, max_iter=3000)
    r_m = cg_solve(disc.elasticity_constrained, b, jnp.zeros_like(b),
                   tol=tol, max_iter=100, precond=precond)
    assert bool(r_m.converged)
    assert int(r_m.iterations) < int(r_j.iterations) / 5
    np.testing.assert_allclose(np.asarray(r_m.x), np.asarray(r_j.x),
                               rtol=1e-6, atol=1e-9)


def test_gmg_pressure_cuts_iterations_2d():
    data = read_input_file(GOLDEN)
    n, dt = 32, 60.0
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    precond, _ = build_gmg_pressure(data, n_fine=n, n_levels=3,
                                    dtype=np.float64, dt=dt)

    def jac(x):
        return (1.0 / data.m_modulus / dt) * disc.mass(x) \
            + (data.perm / data.visc) * disc.laplace(x)

    diag = (1.0 / data.m_modulus / dt) * disc.diag_mass \
        + (data.perm / data.visc) * disc.diag_laplace
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(disc.n_pdofs))
    tol = 1e-9 * float(jnp.linalg.norm(b))
    r_j = cg_solve(jac, b, jnp.zeros_like(b), diag=diag, tol=tol,
                   max_iter=3000)
    r_m = cg_solve(jac, b, jnp.zeros_like(b), tol=tol, max_iter=100,
                   precond=precond)
    assert bool(r_m.converged)
    assert int(r_m.iterations) < max(10, int(r_j.iterations) / 4)
    np.testing.assert_allclose(np.asarray(r_m.x), np.asarray(r_j.x),
                               rtol=1e-6, atol=1e-12)


def test_gmg_pressure_respects_drainage_bc():
    """Terzaghi-style drainage BC: level masks must be consistent and the
    preconditioned solve must still match Jacobi-CG."""
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, pressure_boundary_labels=(3,),
                               pressure_boundary_values=(0.0,))
    n, dt = 16, 60.0
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    precond, levels = build_gmg_pressure(data, n_fine=n, n_levels=2,
                                         dtype=np.float64, dt=dt)
    assert not bool(np.asarray(levels[0].free_mask).all())

    def jac(x):
        m = disc.free_mask_p
        xm = x * m
        y = (1.0 / data.m_modulus / dt) * disc.mass(xm) \
            + (data.perm / data.visc) * disc.laplace(xm)
        return y * m + x * (1 - m)

    diag = jnp.where(disc.free_mask_p > 0,
                     (1.0 / data.m_modulus / dt) * disc.diag_mass
                     + (data.perm / data.visc) * disc.diag_laplace, 1.0)
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(disc.n_pdofs)) * disc.free_mask_p
    tol = 1e-9 * float(jnp.linalg.norm(b))
    r_j = cg_solve(jac, b, jnp.zeros_like(b), diag=diag, tol=tol,
                   max_iter=3000)
    r_m = cg_solve(jac, b, jnp.zeros_like(b), tol=tol, max_iter=100,
                   precond=precond)
    assert bool(r_m.converged)
    np.testing.assert_allclose(np.asarray(r_m.x), np.asarray(r_j.x),
                               rtol=1e-6, atol=1e-12)


def test_richardson_with_gmg_matches_cg_solution():
    """Preconditioned Richardson (the f32-robust companion solver) reaches
    the same solution as GMG-CG."""
    from poroelasticity_dealii_tpu.solvers.cg import richardson_solve
    data = read_input_file(DECK3D)
    n = 8
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    precond, _ = build_gmg_elasticity(data, n_fine=n, n_levels=2,
                                      dtype=np.float64)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(disc.n_udofs)) * disc.free_mask_u
    tol = 1e-9 * float(jnp.linalg.norm(b))
    r_rich = richardson_solve(disc.elasticity_constrained, b,
                              jnp.zeros_like(b), precond, tol, 200)
    r_cg = cg_solve(disc.elasticity_constrained, b, jnp.zeros_like(b),
                    tol=tol, max_iter=100, precond=precond)
    assert bool(r_rich.converged) and bool(r_cg.converged)
    np.testing.assert_allclose(np.asarray(r_rich.x), np.asarray(r_cg.x),
                               rtol=1e-6, atol=1e-10)


def test_f32_mech_gmg_uses_richardson_end_to_end():
    """f32 + elasticity GMG: the FSS solver selects Richardson and the full
    step matches the GMG-off run."""
    from poroelasticity_dealii_tpu.solvers import FixedStressSolver
    data = read_input_file(DECK3D)
    data = dataclasses.replace(
        data, dtype="float32", fss_tol=1e-4, pressure_tol=1e-4,
        mech_cg_tol=1e-4, mech_cg_relative=True,
        pressure_cg_tol=1e-5, projection_cg_tol=1e-5)
    d_off = build_grid_discretization(data, cells_per_axis=8,
                                      multigrid="off")
    d_on = build_grid_discretization(data, cells_per_axis=8,
                                     multigrid="on")
    assert d_on.gmg_precond is not None
    s_off = FixedStressSolver(d_off, data)
    s_on = FixedStressSolver(d_on, data)
    st_off = s_off.initial_state()
    st_on = s_on.initial_state()
    # different solvers agree to the mech tolerance only (u scale ~1e-5)
    np.testing.assert_allclose(np.asarray(st_on.u), np.asarray(st_off.u),
                               atol=1e-8)
    a_off, t_off = s_off.time_step(st_off, data.time_step)
    a_on, t_on = s_on.time_step(st_on, data.time_step)
    assert bool(t_on.cg_converged)
    np.testing.assert_allclose(np.asarray(a_on.p), np.asarray(a_off.p),
                               rtol=1e-4)


def test_q1_direct_transfers_match_conv_pipeline():
    """The direct nodal-interpolation Q1 transfers equal the conv
    gather/einsum/scatter + multiplicity-normalization pipeline exactly
    (they are the same FE-embedding matrix P and its transpose)."""
    import numpy as np

    import jax.numpy as jnp

    from poroelasticity_dealii_tpu.ops.shape import node_lattice
    from poroelasticity_dealii_tpu.ops.stencil import (_scatter_kernel,
                                                       _to_kernel,
                                                       conv_cellwise,
                                                       conv_scatter)
    from poroelasticity_dealii_tpu.solvers.multigrid import (
        _interleave_parities, _deinterleave_parities,
        _parity_embedding_matrices, _q1_direct_transfers)

    for dim, nc in ((1, 5), (2, 4), (3, 3)):
        E = jnp.asarray(_parity_embedding_matrices(dim, 1, 1), jnp.float64)
        ik = jnp.asarray(_to_kernel(np.eye(2 ** dim), 1, 1, dim),
                         jnp.float64)
        sk = jnp.asarray(_scatter_kernel(1, 2 ** dim, 1, 1, dim),
                         jnp.float64)
        nf = 2 * nc
        g_c, g_f = nc + 1, nf + 1

        def conv_p(xc):
            uc = conv_cellwise(xc, ik, 1, dim, 1, g_c)
            ye = jnp.einsum("sab,bE->saE", E, uc)
            ye_f = _interleave_parities(ye, dim, nc)
            return conv_scatter(ye_f.reshape(ye.shape[1], -1), sk, 1, dim,
                                1, nf)

        def conv_r(yf):
            ye_f = conv_cellwise(yf, ik, 1, dim, 1, g_f)
            ye = _deinterleave_parities(ye_f, dim, nc)
            zc = jnp.einsum("sab,saE->bE", E, ye)
            return conv_scatter(zc, sk, 1, dim, 1, nc)

        rng = np.random.default_rng(3)
        xc = jnp.asarray(rng.standard_normal(g_c ** dim))
        yf = jnp.asarray(rng.standard_normal(g_f ** dim))
        mult = conv_p(jnp.ones(g_c ** dim))
        raw_p, raw_r = _q1_direct_transfers(dim, nc, jnp.float64)
        np.testing.assert_allclose(np.asarray(raw_p(xc)),
                                   np.asarray(conv_p(xc) / mult),
                                   rtol=1e-13, atol=1e-14)
        np.testing.assert_allclose(np.asarray(raw_r(yf)),
                                   np.asarray(conv_r(yf / mult)),
                                   rtol=1e-13, atol=1e-14)
        # exact adjoint: <P xc, yf> == <xc, R yf>
        a = float(jnp.vdot(raw_p(xc), yf))
        b = float(jnp.vdot(xc, raw_r(yf)))
        assert a == pytest.approx(b, rel=1e-13)


def test_multiplicity_numpy_matches_device():
    """The host-side prolongation multiplicity (the round-5 fix for the
    GMG setup compile storm) is bit-for-bit the eager raw_p(ones) it
    replaced, for 2D/3D, scalar and vector spaces."""
    import jax.numpy as jnp
    from poroelasticity_dealii_tpu.mesh.structured import (
        build_structured_space, structured_mesh)
    from poroelasticity_dealii_tpu.ops.stencil import (
        _scatter_kernel, _to_kernel, conv_cellwise, conv_scatter)
    from poroelasticity_dealii_tpu.solvers.multigrid import (
        _interleave_parities, _parity_embedding_matrices,
        _prolong_multiplicity_np)

    for dim, nc, n_comp in ((2, 4, 2), (2, 6, 1), (3, 2, 3), (3, 4, 1)):
        degree = 2
        nf = 2 * nc
        E = _parity_embedding_matrices(dim, degree, n_comp)
        n_local = ((degree + 1) ** dim) * n_comp
        ik = jnp.asarray(_to_kernel(np.eye(n_local), n_comp, degree, dim),
                         jnp.float64)
        sk = jnp.asarray(_scatter_kernel(n_comp, (degree + 1) ** dim,
                                         n_comp, degree, dim), jnp.float64)
        Es = jnp.asarray(E, jnp.float64)
        g_c = degree * nc + 1
        xc = jnp.ones((n_comp * g_c ** dim,), jnp.float64)
        uc = conv_cellwise(xc, ik, degree, dim, n_comp, g_c)
        ye = jnp.einsum("sab,bE->saE", Es, uc)
        ye_f = _interleave_parities(ye, dim, nc)
        device = np.asarray(conv_scatter(ye_f.reshape(ye.shape[1], -1), sk,
                                         degree, dim, n_comp, nf))
        mesh = structured_mesh([1.0] * dim, nf)
        space, _ = build_structured_space(mesh, nf, degree)
        conn = space.vector_cell_dofs(n_comp) if n_comp > 1 \
            else space.cell_nodes
        host = _prolong_multiplicity_np(E, conn, nf, dim, n_comp,
                                        n_comp * (degree * nf + 1) ** dim)
        np.testing.assert_allclose(host, device, rtol=1e-13, atol=0.0)


def test_parity_resident_transfers_match_flat_vcycle():
    """The parity-resident GMG transfers (ops/parity2d.make_parity_transfers
    — round-5 V-cycle cost fix) implement the SAME P/R operators as the
    flat conv-form transfers: the full V-cycle preconditioner output with
    parity_layout=True matches parity_layout=False to f64 roundoff.
    n_levels=3 forces a parity->parity level boundary (levels 0 and 1 are
    both parity-resident) plus the parity->flat coarsest boundary."""
    data = read_input_file(GOLDEN)
    n = 8
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    p_flat, _ = build_gmg_elasticity(data, n_fine=n, n_levels=3,
                                     dtype=np.float64, parity_layout=False)
    p_par, levels = build_gmg_elasticity(data, n_fine=n, n_levels=3,
                                         dtype=np.float64,
                                         parity_layout=True)
    assert levels[0].prolong_l is not None      # the new path is active
    assert levels[1].apply_l is not None
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.standard_normal(disc.n_udofs)) * disc.free_mask_u
    a = np.asarray(p_flat(r))
    b = np.asarray(p_par(r))
    np.testing.assert_allclose(b, a, rtol=1e-11,
                               atol=1e-13 * np.abs(a).max())
    # the layout-resident entry point agrees too
    from poroelasticity_dealii_tpu.ops.parity2d import from_parity, to_parity
    c = np.asarray(from_parity(p_par.rows(to_parity(r, n, 2)), n, 2))
    np.testing.assert_allclose(c, a, rtol=1e-11,
                               atol=1e-13 * np.abs(a).max())
