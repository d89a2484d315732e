"""Gravity body force: off by default (the reference's BodyForces is
effectively dead code, SURVEY §2.1.2); physically correct when enabled."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import build_fe_space, hyper_rectangle
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

GOLDEN = "configs/golden_2d.data"


def test_gravity_off_by_default():
    data = read_input_file(GOLDEN)
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    np.testing.assert_allclose(np.asarray(disc.f_neumann), 0.0)


def test_gravity_resultant_force():
    """sum of the body-force vector over the gravity component must equal
    -9.81 * rho * domain volume (partition of unity)."""
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, gravity_direction=1)
    mesh = hyper_rectangle(data.domain_size, 3)
    disc = build_discretization(mesh, data)
    f = np.asarray(disc.f_neumann).reshape(-1, 2)
    total_y = f[:, 1].sum()
    vol = 10.0 * 10.0
    assert np.isclose(total_y, -9.81 * data.bulk_density * vol)
    np.testing.assert_allclose(f[:, 0], 0.0)


def test_gravity_column_stress():
    """Uniaxial column under self-weight: sigma_yy(y) = -rho g (H/2 - y)
    (roller sides + bottom, free top, no pressure coupling)."""
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data, gravity_direction=1, p_init=0.0, flow_rate=0.0,
        biot_coef=0.1,  # min bound; p = 0 so coupling is inert anyway
        displacement_boundary_labels=(0, 1, 2),
        displacement_boundary_components=(0, 0, 1),
        displacement_boundary_values=(0.0, 0.0, 0.0))
    mesh = hyper_rectangle(data.domain_size, 4)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    sig = np.asarray(solver.effective_stresses(st.strains))
    coords = disc.pressure_space.node_coords
    rho_g = 9.81 * data.bulk_density
    expect = -rho_g * (5.0 - coords[:, 1])
    # interior nodes (projection rings at boundaries)
    inner = np.abs(coords[:, 0]) < 4.0
    err = np.abs(sig[2][inner] - expect[inner]).max() / (rho_g * 10)
    assert err < 0.02, err


def test_structured_gravity_matches_generic():
    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, gravity_direction=0,
                               initial_refinement_level=3)
    mesh = hyper_rectangle(data.domain_size, 3)
    dg = build_discretization(mesh, data)
    ds = build_grid_discretization(data, cells_per_axis=8)
    assert np.isclose(np.asarray(dg.f_neumann).sum(),
                      np.asarray(ds.f_neumann).sum())
