"""3D consolidation cube end-to-end (BASELINE.json config #3) at small
size: Q2/Q1 pair, all paths (generic, structured-slices, structured-conv)
agree, physics sane."""

import dataclasses

import numpy as np
import pytest

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)
from poroelasticity_dealii_tpu.solvers.structured import \
    build_grid_discretization

DECK = "configs/consolidation_3d.data"


@pytest.fixture(scope="module")
def data():
    d = read_input_file(DECK)
    return dataclasses.replace(d, initial_refinement_level=1, t_max=120.0)


def test_deck_parses(data):
    assert data.dim == 3
    assert data.displacement_boundary_labels == (0, 1, 2, 3, 4, 5)


def test_full_run_3d_paths_agree(data):
    mesh = hyper_rectangle(data.domain_size, 1)
    dg = build_discretization(mesh, data)
    dc = build_grid_discretization(data, cells_per_axis=2, backend="conv")
    sg, sc = FixedStressSolver(dg, data), FixedStressSolver(dc, data)
    stg, stc = sg.initial_state(), sc.initial_state()
    ag, tg = sg.time_step(stg, data.time_step)
    ac, tc = sc.time_step(stc, data.time_step)
    assert int(tg.fss_iterations) == int(tc.fss_iterations)
    assert int(tg.pressure_iterations) == int(tc.pressure_iterations)
    assert bool(tg.cg_converged) and bool(tc.cg_converged)
    # node numbering differs; compare permutation-invariant reductions
    for a, b in ((ag.p, ac.p), (ag.eps_v, ac.eps_v)):
        assert np.isclose(float(np.sum(a)), float(np.sum(b)), rtol=1e-9)
        assert np.isclose(float(np.max(a)), float(np.max(b)), rtol=1e-9)


def test_3d_injection_physics(data):
    dc = build_grid_discretization(data, cells_per_axis=4)
    solver = FixedStressSolver(dc, data)
    st = solver.initial_state()
    # triaxial 1e-5 compression of a 10 m cube -> eps_v = -3e-6
    np.testing.assert_allclose(np.asarray(st.eps_v), -3e-6, rtol=1e-5)
    for _ in range(2):
        st, stats = solver.time_step(st, data.time_step)
    p = np.asarray(st.p)
    assert p.min() >= data.p_init - 1.0
    coords = dc.pressure_space.node_coords
    center = np.argmin(np.linalg.norm(coords, axis=1))
    assert p[center] == pytest.approx(p.max(), rel=1e-6)
    # 3D VTK output path
    import tempfile, os
    from poroelasticity_dealii_tpu.utils.vtk_io import (
        displacement_at_pressure_nodes, write_vtk)
    with tempfile.TemporaryDirectory() as td:
        u_p = displacement_at_pressure_nodes(
            dc.pressure_space, dc.displacement_space, np.asarray(st.u))
        sig = np.asarray(solver.effective_stresses(st.strains))
        path = os.path.join(td, "out.vtk")
        write_vtk(path, dc.pressure_space, u_p, p,
                  np.asarray(st.strains), sig)
        txt = open(path).read()
        assert "CELL_TYPES 64" in txt and "SCALARS sigma_zz" in txt
