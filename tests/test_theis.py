"""Analytical well-source validation: Theis line-source transient.

The reference's only flow forcing is the disc-shaped well
(``right_hand_side.h:99-116``: rate density -Q/(pi r_w^2) inside radius
r_w), previously validated only by discrete mass balance.  This test
checks the full space-time response: with ``biot_coef = 0`` the pressure
equation decouples to pure diffusion

    (1/M) dp/dt = (k/mu) lap(p) + Q/(pi r_w^2) chi_disc,

whose far-field (r >> r_w) response on an effectively infinite domain is
the Theis solution

    dp(r, t) = (Q mu / (4 pi k)) * E1(r^2 / (4 alpha t)),
    alpha    = (k / mu) * M.

Error budget (measured while calibrating): backward-Euler time error
grows like u^2 * (dt/t) with u = r^2/(4 alpha t) — so the assertions sit
at u <= ~1.2 where the h- and dt-converged agreement is 2-5%.  The
discrete total rate Q_eff = -sum(f_well) replaces the nominal Q (the
coarse quadrature under-resolves pi r_w^2, exactly as in the reference).
"""

import dataclasses

import numpy as np
import pytest
from scipy.special import exp1

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)


@pytest.fixture(scope="module")
def theis_run():
    data = read_input_file("configs/golden_2d.data")
    # biot_coef=0 bypasses the deck's reference-faithful [0.1, 1] bounds
    # deliberately: it is the standard decoupling limit (flow only)
    data = dataclasses.replace(
        data, biot_coef=0.0, domain_size=(100.0, 100.0),
        initial_refinement_level=7,        # 128^2 cells, h = 0.78 m
        flow_rate=1e-5, time_step=2.5)
    mesh = hyper_rectangle(data.domain_size, data.initial_refinement_level)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    alpha = (data.perm / data.visc) * data.m_modulus
    q_eff = -float(np.sum(np.asarray(disc.f_well)))
    st = solver.initial_state()
    snaps = {}
    for block, t in ((24, 60.0), (24, 120.0)):
        st, _ = solver.multi_step(st, data.time_step, n_steps=block)
        snaps[t] = np.asarray(st.p) - data.p_init
    r = np.linalg.norm(disc.pressure_space.node_coords, axis=1)
    return data, alpha, q_eff, r, snaps


def _theis(data, alpha, q_eff, r, t):
    return (q_eff * data.visc) / (4.0 * np.pi * data.perm) \
        * exp1(r * r / (4.0 * alpha * t))


def _ring_mean(dp, r, rr, width=0.2):
    sel = np.abs(r - rr) < width
    assert sel.sum() >= 4
    return float(dp[sel].mean())


def test_theis_drawdown_profile(theis_run):
    """Radial profile at t=120 s matches E1 at the front-resolved radii."""
    data, alpha, q_eff, r, snaps = theis_run
    dp = snaps[120.0]
    for rr, tol in ((3.0, 0.08), (4.0, 0.06), (5.0, 0.06), (6.0, 0.06)):
        num = _ring_mean(dp, r, rr)
        ana = _theis(data, alpha, q_eff, rr, 120.0)
        assert abs(num - ana) <= tol * ana, \
            f"r={rr}: {num:.4g} vs Theis {ana:.4g}"


def test_theis_transient_growth(theis_run):
    """The t=60 -> t=120 growth at each radius follows E1's time
    dependence (validates alpha = k M / mu, not just the prefactor)."""
    data, alpha, q_eff, r, snaps = theis_run
    # small radii only: the backward-Euler overshoot at t=60 grows like
    # u^2 (dt/t) and distorts the ratio ~10% by r=5 (measured)
    for rr in (3.0, 4.0):
        g_num = (_ring_mean(snaps[120.0], r, rr)
                 / _ring_mean(snaps[60.0], r, rr))
        g_ana = (_theis(data, alpha, q_eff, rr, 120.0)
                 / _theis(data, alpha, q_eff, rr, 60.0))
        assert g_num == pytest.approx(g_ana, rel=0.07)


def test_theis_front_contained(theis_run):
    """The no-flow box boundary must not pollute the compared window: the
    response at r=30 is negligible vs the near field (the analytical
    front sqrt(4 alpha t) ~ 5.5 m at t=120)."""
    data, alpha, q_eff, r, snaps = theis_run
    dp = snaps[120.0]
    assert _ring_mean(dp, r, 30.0, width=0.5) < 1e-4 * _ring_mean(dp, r, 3.0)


def test_theis_radial_symmetry(theis_run):
    """Ring scatter is small relative to the ring mean (the disc source +
    Cartesian mesh preserve radial symmetry away from the well)."""
    data, alpha, q_eff, r, snaps = theis_run
    dp = snaps[120.0]
    sel = np.abs(r - 5.0) < 0.2
    assert np.std(dp[sel]) < 0.05 * abs(np.mean(dp[sel]))
