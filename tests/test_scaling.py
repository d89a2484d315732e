"""Nondimensionalization: the TPU / Nondimensionalize = true similarity
rescale is exact — same iteration history, same fields after rescaling —
and centers all solver arithmetic at O(1) (ROADMAP item 9)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.models.scaling import nondimensionalize
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

GOLDEN = "configs/golden_2d.data"


def _run(data, n_steps=3):
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    hist = []
    for _ in range(n_steps):
        st, stats = solver.time_step(st, data.time_step)
        hist.append((int(stats.fss_iterations),
                     int(stats.pressure_iterations),
                     int(stats.pressure_cg_iterations),
                     int(stats.mech_cg_iterations)))
    return st, hist


def test_nondimensional_run_matches_dimensional():
    data = read_input_file(GOLDEN)
    st_dim, hist_dim = _run(data)
    scaled, sc = nondimensionalize(data)
    assert scaled.youngs_modulus == 1.0
    assert max(scaled.domain_size) == 1.0
    assert scaled.time_step == 1.0
    st_nd, hist_nd = _run(scaled)
    # matching convergence history (the rescale is a similarity transform
    # with consistently scaled tolerances): FSS/pressure structure is
    # identical; mechanics CG counts may differ by a few iterations from
    # rounding-path differences near the absolute stopping threshold
    for a, b in zip(hist_dim, hist_nd):
        assert a[:3] == b[:3]
        assert abs(a[3] - b[3]) <= 5, (a, b)
    np.testing.assert_allclose(sc.p(np.asarray(st_nd.p)),
                               np.asarray(st_dim.p), rtol=1e-10)
    np.testing.assert_allclose(sc.u(np.asarray(st_nd.u)),
                               np.asarray(st_dim.u), rtol=1e-8,
                               atol=1e-16)
    # strains are dimensionless: identical directly
    np.testing.assert_allclose(np.asarray(st_nd.eps_v),
                               np.asarray(st_dim.eps_v), rtol=1e-8,
                               atol=1e-20)


def test_nondimensional_magnitudes_are_order_one():
    """The point of the exercise: solver-visible magnitudes near 1."""
    data = read_input_file(GOLDEN)
    scaled, sc = nondimensionalize(data)
    mesh = hyper_rectangle(scaled.domain_size, 3)
    disc = build_discretization(mesh, scaled)
    # stiffness diagonal O(1) instead of O(E) ~ 1e10
    dial = np.asarray(disc.diag_elasticity)
    assert 1e-3 < np.median(dial) < 1e3
    # pressure scaled by the stress scale: p_init/E ~ 7e-4 (bounded by 1)
    assert 0.0 < scaled.p_init < 1.0
    assert scaled.time_step == 1.0 and scaled.t_max > 1.0


def test_nondimensional_runner_outputs_si(tmp_path):
    """run_from_data with Nondimensionalize writes SI-valued VTK."""
    import os
    from poroelasticity_dealii_tpu.models.runner import run_from_data
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data, t_max=120.0, nondimensionalize=True,
        output_directory=str(tmp_path))
    os.makedirs(data.output_directory, exist_ok=True)
    state = run_from_data(data)
    # pressure and geometry in the VTK are back in SI
    vtk = open(tmp_path / "solution-0002.vtk").read()
    import re
    m = re.search(r"SCALARS p[^\n]*\nLOOKUP_TABLE default\n([\s\S]+?)"
                  r"SCALARS", vtk)
    vals = np.array([float(v) for v in m.group(1).split()])
    assert 0.9e7 < vals.max() < 1.3e7    # ~p_init scale, Pa
    pts = re.search(r"POINTS \d+ double\n([\s\S]+?)CELLS", vtk).group(1)
    coords = np.array([float(v) for v in pts.split()])
    assert np.isclose(np.abs(coords).max(), 5.0)   # 10 m domain, meters


def test_nondimensional_amr_matches_dimensional(tmp_path):
    """Nondimensionalize composes with AMR: Kelly's error distribution is
    scale-invariant, so the remesh picks the same cells and fields match
    after rescaling.

    Asymmetric 10x14 domain: on the square golden deck the well's mirror
    symmetry makes pairs of cells carry Kelly etas equal to ~9 digits,
    and the fixed-fraction marking — an exact sort with cumulative-
    fraction cutoffs — can then refine DIFFERENT (but equally valid)
    near-tied cells under the rescale's ~1e-9 rounding differences
    (observed: same leaf count, one flipped cell pair, 1%-level local p
    differences from comparing different meshes).  Breaking the symmetry
    removes the ties; parity is then exact to machine precision."""
    from poroelasticity_dealii_tpu.amr.driver import AMRSimulationRunner
    base = read_input_file(GOLDEN)
    base = dataclasses.replace(
        base, amr=True, initial_refinement_level=3, max_refinement_level=4,
        refine_every=3, t_max=300.0, output_vtk=False,
        domain_size=(10.0, 14.0), output_directory=str(tmp_path))
    st_dim, hist_dim = AMRSimulationRunner(base).run()
    scaled, sc = nondimensionalize(base)
    st_nd, hist_nd = AMRSimulationRunner(scaled, scales=sc).run()
    cells_dim = [h["n_cells"] for h in hist_dim]
    assert cells_dim == [h["n_cells"] for h in hist_nd]
    assert cells_dim[0] != cells_dim[-1]          # the remesh happened
    assert [h["fss"] for h in hist_dim] == [h["fss"] for h in hist_nd]
    np.testing.assert_allclose(sc.p(np.asarray(st_nd.p)),
                               np.asarray(st_dim.p), rtol=1e-9)
    np.testing.assert_allclose(sc.u(np.asarray(st_nd.u)),
                               np.asarray(st_dim.u), rtol=1e-7, atol=1e-16)


def test_kelly_distribution_scale_invariant():
    """The marking input itself: Kelly eta on the nondimensionalized
    problem is a uniform multiple of the dimensional eta (normalized
    distributions equal), which is why fixed-fraction marks agree."""
    from poroelasticity_dealii_tpu.amr.driver import AMRSimulationRunner
    base = read_input_file(GOLDEN)
    base = dataclasses.replace(base, amr=True, initial_refinement_level=3,
                               max_refinement_level=4, output_vtk=False)
    scaled, sc = nondimensionalize(base)
    from poroelasticity_dealii_tpu.amr.kelly import kelly_estimate

    def eta_after(data, scales):
        r = AMRSimulationRunner(data, scales=scales)
        st, _ = r.run(n_steps=2)
        st = r._real_state(st)
        return np.asarray(kelly_estimate(
            r.forest, r.disc.pressure_space.mesh, np.asarray(st.p)))

    eta_dim = eta_after(base, None)
    eta_nd = eta_after(scaled, sc)
    np.testing.assert_allclose(eta_nd / eta_nd.sum(),
                               eta_dim / eta_dim.sum(), rtol=1e-6,
                               atol=1e-12 * eta_dim.max() / eta_dim.sum())


def test_nondimensional_amr_from_deck_outputs_si(tmp_path):
    """run_from_data wiring: AMR + Nondimensionalize writes SI VTK."""
    import os
    import re
    from poroelasticity_dealii_tpu.models.runner import run_from_data
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data, amr=True, initial_refinement_level=3, max_refinement_level=4,
        refine_every=2, t_max=180.0, nondimensionalize=True,
        output_directory=str(tmp_path))
    os.makedirs(data.output_directory, exist_ok=True)
    run_from_data(data)
    vtk = open(tmp_path / "solution-0003.vtk").read()
    m = re.search(r"SCALARS p[^\n]*\nLOOKUP_TABLE default\n([\s\S]+?)"
                  r"SCALARS", vtk)
    vals = np.array([float(v) for v in m.group(1).split()])
    assert 0.9e7 < vals.max() < 1.3e7    # Pa, not E-scaled
    pts = re.search(r"POINTS \d+ double\n([\s\S]+?)CELLS", vtk).group(1)
    coords = np.array([float(v) for v in pts.split()])
    assert np.isclose(np.abs(coords).max(), 5.0)   # meters


def test_nondimensional_gmsh_mesh_matches_dimensional():
    """Nondimensionalize with a gmsh Mesh file: the runner divides the
    loaded coordinates by the deck's L, making the rescale an exact
    similarity transform on the irregular mesh too."""
    from poroelasticity_dealii_tpu.models.runner import SimulationRunner
    base = read_input_file("configs/irregular_2d.data")
    base = dataclasses.replace(base, t_max=180.0, output_vtk=False)
    r_dim = SimulationRunner(base)
    st_dim = r_dim.solver.initial_state()
    for _ in range(3):
        st_dim, _ = r_dim.solver.time_step(st_dim, base.time_step)
    scaled, sc = nondimensionalize(base)
    r_nd = SimulationRunner(scaled, scales=sc)
    st_nd = r_nd.solver.initial_state()
    for _ in range(3):
        st_nd, _ = r_nd.solver.time_step(st_nd, scaled.time_step)
    np.testing.assert_allclose(sc.p(np.asarray(st_nd.p)),
                               np.asarray(st_dim.p), rtol=1e-9)
    np.testing.assert_allclose(sc.u(np.asarray(st_nd.u)),
                               np.asarray(st_dim.u), rtol=1e-7, atol=1e-16)
