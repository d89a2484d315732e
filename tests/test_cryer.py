"""Cryer's problem: analytical verification of two-way coupling on a
genuinely curved (spherified-cube) hex mesh — the third classical
poroelastic benchmark (with Terzaghi and Mandel), and the only one that
cannot be meshed with axis-aligned cells (SURVEY §4 integration tier;
exercises the distorted-geometry operator path end to end)."""

import dataclasses

import numpy as np
import pytest

from poroelasticity_dealii_tpu.models.cryer import (cryer_center_pressure,
                                                    cryer_config, cryer_mesh,
                                                    cryer_params)
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

RADIUS = 10.0
LOAD = 7.2e6


@pytest.fixture(scope="module")
def cryer_run():
    data = cryer_config(radius=RADIUS, load=LOAD, dt=1.25)
    cp = cryer_params(data, radius=RADIUS, load=LOAD)
    data = dataclasses.replace(data, p_init=float(cp.p0))
    mesh = cryer_mesh(RADIUS, 6)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    st = solver.initial_state()
    u0 = np.asarray(st.u).copy()
    coords = disc.pressure_space.node_coords
    center = int(np.argmin(np.linalg.norm(coords, axis=1)))
    t, history = 0.0, {"t": [], "p_center": []}
    snapshots = {}
    for step in range(100):   # t = 125: analytic p_center/p0 = 0.0125
        t += data.time_step
        st, stats = solver.time_step(st, data.time_step)
        assert bool(stats.cg_converged)
        history["t"].append(t)
        history["p_center"].append(float(np.asarray(st.p)[center]))
        if step in (7, 19, 47, 99):
            snapshots[t] = np.asarray(st.p).copy()
    return data, cp, disc, u0, np.asarray(st.u), history, snapshots


def _radial(disc, u):
    """Project a displacement vector onto e_r per displacement node."""
    xyz = disc.displacement_space.node_coords
    r = np.linalg.norm(xyz, axis=1)
    er = np.divide(xyz, r[:, None], out=np.zeros_like(xyz),
                   where=r[:, None] > 0)
    return r, np.einsum("ni,ni->n", u.reshape(-1, 3), er)


def test_initial_undrained_response(cryer_run):
    """Mechanics solve with uniform p = B*P and traction -P n on the
    curved surface must be the exact undrained elastic response
    u_r = -P r / (3 K_u) (closed form; O(h^2) from the faceted sphere).
    Uses a no-drainage variant: with the drainage BC active the t=0
    pressure is pinned to 0 in the outer node layer, an O(h)-thick
    discrete version of the t=0+ boundary layer (verified first-order:
    9.7/6.1/4.3 % at m = 4/6/8), which is evolution physics rather than
    a geometry error."""
    data, cp, disc, u0, _, _, _ = cryer_run
    nodrain = dataclasses.replace(data, pressure_boundary_labels=(),
                                  pressure_boundary_values=())
    disc2 = build_discretization(cryer_mesh(RADIUS, 6), nodrain)
    u = np.asarray(FixedStressSolver(disc2, nodrain).initial_state().u)
    r, ur = _radial(disc2, u)
    expect = -LOAD * r / (3.0 * cp.bulk_u)
    sel = r > 0.1 * RADIUS
    err = np.linalg.norm(ur[sel] - expect[sel]) / np.linalg.norm(expect[sel])
    assert err < 0.01, err
    # and the drained-config initial state differs only by the O(h)
    # drainage boundary layer
    r0, ur0 = _radial(disc, u0)
    err0 = np.linalg.norm(ur0[sel] - expect[sel]) / np.linalg.norm(
        expect[sel])
    assert err0 < 0.08, err0


def test_center_pressure_matches_series(cryer_run):
    data, cp, disc, _, _, history, _ = cryer_run
    t = np.asarray(history["t"])
    p_num = np.asarray(history["p_center"])
    p_ana = cryer_center_pressure(t, cp)
    err = np.linalg.norm(p_num - p_ana) / np.linalg.norm(p_ana)
    assert err < 0.05, err


def test_mandel_cryer_effect(cryer_run):
    """The center pressure must RISE above the undrained initial value
    before draining — on the sphere as in Mandel's slab, the signature
    of correct two-way coupling."""
    data, cp, disc, _, _, history, _ = cryer_run
    peak = max(history["p_center"])
    assert peak > 1.02 * cp.p0, (peak, cp.p0)
    assert history["p_center"][-1] < 0.5 * cp.p0


def test_pressure_field_matches_series(cryer_run):
    """Full-field (all nodes, all radii) comparison at several times —
    also an implicit radial-symmetry check of the curved-mesh solve."""
    from poroelasticity_dealii_tpu.models.cryer import cryer_pressure
    data, cp, disc, _, _, _, snapshots = cryer_run
    r = np.linalg.norm(disc.pressure_space.node_coords, axis=1)
    for t, p_num in snapshots.items():
        p_ana = cryer_pressure(r, t, cp)
        err = np.linalg.norm(p_num - p_ana) / np.linalg.norm(p_ana)
        assert err < 0.05, (t, err)


def test_drained_limit_displacement(cryer_run):
    """As p -> 0 the sphere approaches the drained elastic response
    u_r = -P r / (3K) (closed form)."""
    data, cp, disc, _, u_end, history, _ = cryer_run
    assert history["p_center"][-1] < 0.02 * cp.p0   # effectively drained
    r, ur = _radial(disc, u_end)
    expect = -LOAD * r / (3.0 * cp.bulk)
    sel = r > 0.1 * RADIUS
    err = np.linalg.norm(ur[sel] - expect[sel]) / np.linalg.norm(expect[sel])
    assert err < 0.02, err


def test_mesh_is_valid_and_curved(cryer_run):
    """Every hex has positive trilinear Jacobians at the quadrature
    points, the outer shell lies on the sphere, and the octant volume
    converges to (4/3 pi R^3)/8 at the straight-edge O(h^2) rate."""
    from poroelasticity_dealii_tpu.ops.quadrature import gauss_tensor
    from poroelasticity_dealii_tpu.ops.shape import shape_tables
    mesh = cryer_mesh(RADIUS, 6)
    pts, wts = gauss_tensor(3, 3)
    _, dn = shape_tables(1, 3, pts)
    jac = np.einsum("fvi,qvj->fqij", mesh.vertices[mesh.cells], dn)
    det = np.linalg.det(jac)
    assert det.min() > 0
    assert np.isclose(np.linalg.norm(mesh.vertices, axis=1).max(), RADIUS)
    vol = float((det * wts[None, :]).sum())
    exact = 4.0 / 3.0 * np.pi * RADIUS ** 3 / 8.0
    assert abs(vol - exact) / exact < 0.01
    vol12 = None
    mesh12 = cryer_mesh(RADIUS, 12)
    jac12 = np.einsum("fvi,qvj->fqij", mesh12.vertices[mesh12.cells], dn)
    vol12 = float((np.linalg.det(jac12) * wts[None, :]).sum())
    # quadratic convergence of the tiled volume
    assert abs(vol12 - exact) < 0.35 * abs(vol - exact)
