"""Neumann (stress) boundary conditions: traction-loaded column.

Reference semantics (PoroElasticDisplacementSolver.h:263-273): the applied
traction on component c is ``value * n_c``."""

import dataclasses

import numpy as np

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

GOLDEN = "configs/golden_2d.data"
T = 2.5e6   # applied compression magnitude


def _column_data():
    data = read_input_file(GOLDEN)
    return dataclasses.replace(
        data, p_init=0.0, flow_rate=0.0,
        # rollers left/right/bottom; traction on top: value * n_y = -T
        displacement_boundary_labels=(0, 1, 2),
        displacement_boundary_components=(0, 0, 1),
        displacement_boundary_values=(0.0, 0.0, 0.0),
        stress_boundary_labels=(3,),
        stress_boundary_components=(1,),
        stress_boundary_values=(-T,))


def test_traction_column_stress():
    data = _column_data()
    mesh = hyper_rectangle(data.domain_size, 4)
    disc = build_discretization(mesh, data)
    # the traction vector must integrate to -T * width on component y
    f = np.asarray(disc.f_neumann).reshape(-1, 2)
    assert np.isclose(f[:, 1].sum(), -T * 10.0)
    np.testing.assert_allclose(f[:, 0], 0.0)

    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    sig = np.asarray(solver.effective_stresses(st.strains))
    coords = disc.pressure_space.node_coords
    inner = (np.abs(coords[:, 0]) < 4.0) & (np.abs(coords[:, 1]) < 4.0)
    # uniaxial strain: sigma_yy = -T everywhere, sigma_xy = 0
    np.testing.assert_allclose(sig[2][inner], -T, rtol=1e-6)
    np.testing.assert_allclose(sig[1][inner], 0.0, atol=1e-6 * T)
    # sigma_xx = nu/(1-nu) * sigma_yy under lateral confinement
    nu = data.poisson_ratio
    np.testing.assert_allclose(sig[0][inner], -T * nu / (1 - nu), rtol=1e-6)
    # displacement: u_y(top) = -T H / (lam + 2G)
    u = np.asarray(st.u).reshape(-1, 2)
    ucoords = disc.displacement_space.node_coords
    top = np.isclose(ucoords[:, 1], 5.0)
    expect = -T * 10.0 / (data.lame_constant + 2 * data.shear_modulus)
    np.testing.assert_allclose(u[top, 1], expect, rtol=1e-6)


def test_traction_on_gmsh_mesh():
    """Same column physics through the unstructured gmsh reader path."""
    import os
    import pytest
    if not os.path.exists("/root/reference/domain.msh"):
        pytest.skip("reference mesh asset unavailable")
    from poroelasticity_dealii_tpu.mesh import read_msh
    data = _column_data()
    # the gmsh asset uses its own physical ids (domain.geo:26-30):
    # 0=bottom, 1=right, 2=top, 3=left — NOT the colorize convention
    data = dataclasses.replace(
        data,
        displacement_boundary_labels=(3, 1, 0),
        displacement_boundary_components=(0, 0, 1),
        displacement_boundary_values=(0.0, 0.0, 0.0),
        stress_boundary_labels=(2,))
    mesh = read_msh("/root/reference/domain.msh")
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    u = np.asarray(st.u).reshape(-1, 2)
    ucoords = disc.displacement_space.node_coords
    top = np.isclose(ucoords[:, 1], 5.0)
    expect = -T * 10.0 / (data.lame_constant + 2 * data.shear_modulus)
    np.testing.assert_allclose(u[top, 1], expect, rtol=1e-5)


def test_traction_1d_bar():
    """1D bar, fixed at x=0 (label 0), end load at x=L (label 1): the face
    integral degenerates to a point evaluation with n = +1, and
    u(x) = T x / (lambda + 2 mu) exactly (closes the round-1
    `NotImplementedError("Neumann faces in 1D")` scope guard)."""
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data, dim=1, domain_size=(10.0,), p_init=0.0, flow_rate=0.0,
        displacement_boundary_labels=(0,),
        displacement_boundary_components=(0,),
        displacement_boundary_values=(0.0,),
        stress_boundary_labels=(1,),
        stress_boundary_components=(0,),
        stress_boundary_values=(T,))
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    f = np.asarray(disc.f_neumann)
    assert np.isclose(f.sum(), T)          # resultant = value * n = +T
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    u = np.asarray(st.u)
    x = disc.displacement_space.node_coords[:, 0]
    # hyper_rectangle domains are centered: shift to the fixed end
    expect = T * (x - x.min()) / (data.lame_constant
                                  + 2 * data.shear_modulus)
    np.testing.assert_allclose(u, expect, rtol=1e-8, atol=1e-18)
