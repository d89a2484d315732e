"""Terzaghi consolidation: analytical verification (SURVEY §4 integration
tier, BASELINE.json config #1)."""

import dataclasses

import numpy as np
import pytest

from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.models.terzaghi import (
    consolidation_coefficient, quirk_mode_1d_reference, terzaghi_config,
    terzaghi_pressure)
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

H = 10.0
P0 = 1e5


def _run(data, n_steps):
    mesh = hyper_rectangle(data.domain_size, data.initial_refinement_level)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    for _ in range(n_steps):
        st, stats = solver.time_step(st, data.time_step)
    return disc, st, stats


def test_corrected_mode_matches_analytical_series():
    data = terzaghi_config(level=4, dt=25.0, resync=True)
    cv = consolidation_coefficient(data)
    disc, st, _ = _run(data, 10)
    coords = disc.pressure_space.node_coords
    z = H / 2 - coords[:, 1]             # distance from drained top
    p_ana = terzaghi_pressure(z, 250.0, cv, H, P0)
    err = np.linalg.norm(np.asarray(st.p) - p_ana) / np.linalg.norm(p_ana)
    assert err < 0.03, err               # backward-Euler-dominated


def test_corrected_mode_converges_with_dt():
    data_c = terzaghi_config(level=4, dt=50.0, resync=True)
    data_f = terzaghi_config(level=4, dt=12.5, resync=True)
    cv = consolidation_coefficient(data_c)
    disc, st_c, _ = _run(data_c, 4)      # both to t = 200 s
    _, st_f, _ = _run(data_f, 16)
    coords = disc.pressure_space.node_coords
    z = H / 2 - coords[:, 1]
    p_ana = terzaghi_pressure(z, 200.0, cv, H, P0)
    err_c = np.linalg.norm(np.asarray(st_c.p) - p_ana) / np.linalg.norm(p_ana)
    err_f = np.linalg.norm(np.asarray(st_f.p) - p_ana) / np.linalg.norm(p_ana)
    # first-order time discretization: 4x smaller dt -> ~4x smaller error
    assert err_f < 0.5 * err_c, (err_c, err_f)


def test_quirk_mode_matches_independent_1d_oracle():
    """The reference-faithful mode solves the *quirk* equation (accumulation
    vs t=0 strain, eps_v by predictor only — SURVEY §2.1.4); verify our 2D
    FEM implementation against an independent 1D replication of exactly
    those update equations, with tight tolerances so both sides converge."""
    data = terzaghi_config(level=4, dt=25.0, resync=False)
    data = dataclasses.replace(data, fss_tol=1e-12, pressure_tol=1e-12)
    disc, st, _ = _run(data, 8)
    coords = disc.pressure_space.node_coords
    xs = coords[:, 0]
    col = np.isclose(xs, xs[np.argmin(np.abs(xs))])
    ys = coords[col, 1]
    order = np.argsort(ys)
    p_col = np.asarray(st.p)[col][order]          # bottom -> top
    p_1d = quirk_mode_1d_reference(P0, 17, H, data, 25.0, 8)
    err = np.linalg.norm(p_col - p_1d) / np.linalg.norm(p_1d)
    assert err < 1e-6, err


def test_solution_is_x_invariant():
    data = terzaghi_config(level=3, dt=25.0, resync=True)
    disc, st, _ = _run(data, 3)
    coords = disc.pressure_space.node_coords
    p = np.asarray(st.p)
    # group nodes by y; pressure must be constant within each row
    for y in np.unique(np.round(coords[:, 1], 9)):
        row = np.isclose(coords[:, 1], y)
        assert p[row].std() < 1e-6 * max(1.0, abs(p[row].mean()))


def test_drained_boundary_pinned():
    data = terzaghi_config(level=3, dt=25.0, resync=True)
    disc, st, _ = _run(data, 2)
    coords = disc.pressure_space.node_coords
    top = np.isclose(coords[:, 1], H / 2)
    np.testing.assert_allclose(np.asarray(st.p)[top], 0.0, atol=1e-12)


def test_resync_mode_preserves_eps_v0():
    """The stored eps_v0 must stay the t=0 strain in resync mode (it feeds
    checkpoints and quirk-mode restarts)."""
    data = terzaghi_config(level=3, dt=25.0, resync=True)
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st0 = solver.initial_state()
    st = st0
    for _ in range(3):
        st, _ = solver.time_step(st, data.time_step)
    np.testing.assert_allclose(np.asarray(st.eps_v0), np.asarray(st0.eps_v0))
    assert not np.allclose(np.asarray(st.eps_v), np.asarray(st0.eps_v))


def test_anisotropic_column_matches_analytical_series():
    """Terzaghi on an anisotropic grid (solution varies along y only): a
    2-cell-wide, 16-cell-tall conv-path column reproduces the series with
    1/8th the cells of the square grid."""
    import dataclasses

    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization
    data = terzaghi_config(level=4, dt=25.0, resync=True)
    data = dataclasses.replace(data, cells_per_axis=(2, 16))
    disc = build_grid_discretization(data)
    assert disc.info_p.cells_per_axis == (2, 16)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    for _ in range(10):
        st, stats = solver.time_step(st, data.time_step)
    cv = consolidation_coefficient(data)
    coords = disc.pressure_space.node_coords
    z = H / 2 - coords[:, 1]
    p_ana = terzaghi_pressure(z, 250.0, cv, H, P0)
    err = np.linalg.norm(np.asarray(st.p) - p_ana) / np.linalg.norm(p_ana)
    assert err < 0.03, err
