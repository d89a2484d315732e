"""Integration tests for the fixed-stress-split coupled solver on the
golden 2D configuration (the reference repo's own input.data physics)."""

import numpy as np
import pytest

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

GOLDEN = "configs/golden_2d.data"


@pytest.fixture(scope="module")
def golden():
    data = read_input_file(GOLDEN)
    mesh = hyper_rectangle(data.domain_size, 3)  # level 3 keeps tests fast
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    return data, disc, solver


def test_initial_state(golden):
    data, disc, solver = golden
    st = solver.initial_state()
    # uniform initial pressure
    np.testing.assert_allclose(st.p, data.p_init)
    # Dirichlet values imposed exactly: u_x = -1e-5 on x-max boundary
    u = np.asarray(st.u).reshape(-1, 2)
    coords = disc.displacement_space.node_coords
    right = np.isclose(coords[:, 0], 5.0)
    np.testing.assert_allclose(u[right, 0], -1e-5, atol=1e-18)
    left = np.isclose(coords[:, 0], -5.0)
    np.testing.assert_allclose(u[left, 0], 0.0, atol=1e-18)
    # uniform pressure + uniform biaxial compression -> uniform volumetric
    # strain = -2e-6 (1e-5 shortening over 10 m on each axis)
    np.testing.assert_allclose(st.eps_v, -2e-6, rtol=1e-6)
    assert np.allclose(st.eps_v, st.eps_v0)


def test_time_step_converges_and_injects(golden):
    data, disc, solver = golden
    st = solver.initial_state()
    st1, stats = solver.time_step(st, data.time_step)
    # FSS loop converges below tolerance
    assert float(stats.pressure_error) < data.fss_tol
    assert int(stats.fss_iterations) >= 1
    assert int(stats.pressure_iterations) >= 1
    # quirk §2.1.4 consequence (faithfully replicated): eps_v is never
    # resynced from u during FSS, so the post-mechanics residual equals the
    # converged pressure residual -> exactly one outer iteration
    assert int(stats.fss_iterations) == 1
    # injection raises pressure, peak at the well (domain center)
    p = np.asarray(st1.p)
    assert p.min() >= data.p_init - 1.0
    center = np.argmin(np.linalg.norm(disc.pressure_space.node_coords, axis=1))
    assert p[center] == pytest.approx(p.max(), rel=1e-6)
    # history buffer well-formed
    hist = np.asarray(stats.fss_error_history)
    assert (hist[:int(stats.fss_iterations)] >= 0).all()
    assert (hist[int(stats.fss_iterations):] == -1).all()


def test_mass_balance_over_steps(golden):
    """Injected volume must show up as fluid accumulation: integrate the
    flow equation over the domain; boundary flux is ~0 early on."""
    data, disc, solver = golden
    st = solver.initial_state()
    dt = data.time_step
    st1, _ = solver.time_step(st, dt)
    # M(1/M_biot (p - p_old)/dt + b (eps_v - eps_v0)/dt) integrated = Q
    ones = np.ones(disc.n_pdofs)
    dp_term = (np.asarray(disc.mass((st1.p - st.p))) @ ones
               / data.m_modulus / dt)
    deps_term = (np.asarray(disc.mass(st1.eps_v - st1.eps_v0)) @ ones
                 * data.biot_coef / dt)
    total_influx = dp_term + deps_term
    # the discrete injection rate is the integral of the sampled disc source
    # (coarse quadrature under-resolves pi*r^2 exactly as the reference's
    # VectorTools::create_right_hand_side would on the same mesh)
    q_discrete = -float(np.asarray(disc.f_well).sum())
    # identity holds up to the FSS residual: |sum_i r_i| <= sqrt(n) ||r||_2
    bound = np.sqrt(disc.n_pdofs) * data.fss_tol
    assert total_influx == pytest.approx(q_discrete, abs=bound)
    assert q_discrete == pytest.approx(data.flow_rate, rel=0.6)


def test_strains_symmetric_solution(golden):
    """The golden config is symmetric under x<->y; strains must be too."""
    data, disc, solver = golden
    st = solver.initial_state()
    st1, _ = solver.time_step(st, data.time_step)
    strains = np.asarray(st1.strains)
    coords = disc.pressure_space.node_coords
    # find index permutation swapping x and y
    order = np.lexsort((coords[:, 0], coords[:, 1]))
    order_T = np.lexsort((coords[:, 1], coords[:, 0]))
    eps_xx, eps_yy = strains[0], strains[2]
    np.testing.assert_allclose(eps_xx[order], eps_yy[order_T], rtol=1e-5,
                               atol=1e-12)


def test_stress_recovery(golden):
    data, disc, solver = golden
    st = solver.initial_state()
    st1, _ = solver.time_step(st, data.time_step)
    sig = np.asarray(solver.effective_stresses(st1.strains))
    eps = np.asarray(st1.strains)
    lam, mu = data.lame_constant, data.shear_modulus
    tr = eps[0] + eps[2]
    np.testing.assert_allclose(sig[0], lam * tr + 2 * mu * eps[0], rtol=1e-12)
    np.testing.assert_allclose(sig[1], 2 * mu * eps[1], rtol=1e-12)
    np.testing.assert_allclose(sig[2], lam * tr + 2 * mu * eps[2], rtol=1e-12)


def test_tightened_tolerances_drive_residual_down():
    """Tightening both tolerances makes the inner loop iterate further and
    reach the tighter residual."""
    import dataclasses
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, fss_tol=1e-11, pressure_tol=1e-11)
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    st1, stats = solver.time_step(st, data.time_step)
    assert float(stats.pressure_error) < 1e-11
    assert int(stats.pressure_iterations) > 5


def test_fss_cap_respected_when_unreachable():
    """fss_tol below what the inner loop delivers: the outer loop must hit
    max_fss_iterations and stop (the reference behaves identically — the
    post-mechanics residual equals the pressure-converged residual, quirk
    §2.1.4, so it can never drop further)."""
    import dataclasses
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, fss_tol=1e-14, max_fss_iterations=7)
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    st1, stats = solver.time_step(st, data.time_step)
    assert int(stats.fss_iterations) == 7
    assert float(stats.pressure_error) > 1e-14


def test_bc_superposition_warm_start():
    """Passing bc_scale_prev enables the linear-superposition warm start:
    same solution, strictly fewer mechanics CG iterations on a ramped
    load."""
    import dataclasses

    import numpy as np

    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.mesh import hyper_rectangle
    from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                                   build_discretization)

    data = read_input_file("configs/golden_2d.data")
    data = dataclasses.replace(data, mech_cg_relative=True,
                               mech_cg_tol=1e-10)
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st0 = solver.initial_state()

    # step with a 10% load ramp, without and with the predictor
    a_plain, t_plain = solver.time_step(st0, data.time_step, 1.1)
    a_pred, t_pred = solver.time_step(st0, data.time_step, 1.1,
                                      bc_scale_prev=1.0)
    np.testing.assert_allclose(np.asarray(a_pred.p), np.asarray(a_plain.p),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(a_pred.u), np.asarray(a_plain.u),
                               rtol=1e-6, atol=1e-14)
    assert int(t_pred.mech_cg_iterations) < int(t_plain.mech_cg_iterations)
    # no-op cases: equal scales, or omitted prev
    a_same, _ = solver.time_step(st0, data.time_step, 1.1,
                                 bc_scale_prev=1.1)
    np.testing.assert_allclose(np.asarray(a_same.p), np.asarray(a_plain.p))


def test_shear_strains_survive_zero_fss_iterations():
    """Degenerate tolerance configuration (fss_tol >= 2*pressure_tol): the
    FSS loop can run ZERO iterations, and the end-of-step shear projection
    must then assemble its RHS from the real u instead of consuming the
    loop-carry initializer (round-3 review finding: the cached-RHS reuse
    silently wiped state.strains[shear] to ~0 in this regime)."""
    import dataclasses
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, fss_tol=1e-4, pressure_tol=1e-9)
    assert data.fss_tol >= 2.0 * data.pressure_tol
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    st, _ = solver.time_step(st, data.time_step)   # establish strains
    from poroelasticity_dealii_tpu.ops.operators import SHEAR_ENTRIES
    shear = SHEAR_ENTRIES[2]
    before = np.linalg.norm(np.asarray(st.strains[np.asarray(shear)]))
    assert before > 0
    st2, stats = solver.time_step(st, data.time_step)
    after = np.linalg.norm(np.asarray(st2.strains[np.asarray(shear)]))
    # the field must stay at the same physical magnitude (tiny drift ok),
    # not collapse toward the zero RHS's solution
    assert after > 0.5 * before, (before, after)
