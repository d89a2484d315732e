"""Mesh generation, Q_k numbering, and gmsh ingestion tests."""

import os

import numpy as np
import pytest

from poroelasticity_dealii_tpu.mesh import (build_fe_space, hyper_rectangle,
                                            read_msh)
from poroelasticity_dealii_tpu.ops.shape import node_lattice, shape_tables

REFERENCE_MSH = "/root/reference/domain.msh"


def test_hyper_rectangle_counts_2d():
    # replicates create_mesh (PoroelasticityFSS.h:419-435) at level 4:
    # 16x16 cells, centered domain
    m = hyper_rectangle([10, 10], 4)
    assert m.n_cells == 256
    assert m.n_vertices == 17 * 17
    assert m.vertices.min() == -5 and m.vertices.max() == 5
    assert m.n_boundary_faces == 4 * 16
    # colorize ids: 0/1 x-low/high, 2/3 y-low/high
    assert set(np.unique(m.face_ids)) == {0, 1, 2, 3}


def test_hyper_rectangle_counts_3d():
    m = hyper_rectangle([1, 2, 3], 2)
    assert m.n_cells == 64
    assert m.n_vertices == 125
    assert m.n_boundary_faces == 6 * 16
    assert set(np.unique(m.face_ids)) == {0, 1, 2, 3, 4, 5}


def test_q1_q2_dof_counts_match_reference_baseline():
    # SURVEY §6: level 4 -> 289 Q1 pressure dofs, 2178 Q2 displacement dofs
    m = hyper_rectangle([10, 10], 4)
    sp = build_fe_space(m, 1)
    su = build_fe_space(m, 2)
    assert sp.n_nodes == 289
    assert su.n_nodes * 2 == 2178


def test_q2_nodes_conform_to_geometry():
    for dim, size, lvl in [(2, [3.0, 2.0], 2), (3, [1.0, 2.0, 1.5], 1)]:
        m = hyper_rectangle(size, lvl)
        s = build_fe_space(m, 2)
        lat = node_lattice(2, dim) - 1.0  # ref coords in [-1,1]
        phi, _ = shape_tables(1, dim, lat)
        expect = np.einsum("ic,ecd->eid", phi, m.vertices[m.cells])
        got = s.node_coords[s.cell_nodes]
        np.testing.assert_allclose(got, expect, atol=1e-12)
        # continuity: shared nodes appear once
        n1 = 2 ** lvl
        expected_nodes = (2 * n1 + 1) ** dim
        assert s.n_nodes == expected_nodes


def test_q3_2d_space():
    m = hyper_rectangle([1, 1], 1)  # 2x2 cells
    s = build_fe_space(m, 3)
    assert s.n_nodes == 7 * 7
    # every global node coordinate unique
    uniq = np.unique(np.round(s.node_coords, 12), axis=0)
    assert uniq.shape[0] == s.n_nodes


SYNTH_MSH = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
6
1 0 0 0
2 1 0 0
3 2 0 0
4 0 1 0
5 1 1 0
6 2 1 0
$EndNodes
$Elements
8
1 1 2 7 1 1 2
2 1 2 7 1 2 3
3 1 2 9 1 3 6
4 1 2 8 1 6 5
5 1 2 8 1 5 4
6 1 2 9 1 4 1
7 3 2 11 1 1 2 5 4
8 3 2 11 1 2 3 6 5
$EndElements
"""


def test_synthetic_msh():
    m = read_msh(SYNTH_MSH)
    assert m.dim == 2
    assert m.n_cells == 2 and m.n_vertices == 6
    assert m.n_boundary_faces == 6
    assert sorted(np.unique(m.face_ids)) == [7, 8, 9]
    # lexicographic corner ordering: (0,0),(1,0),(0,1),(1,1)
    c0 = m.vertices[m.cells[0]]
    np.testing.assert_allclose(c0, [[0, 0], [1, 0], [0, 1], [1, 1]])


@pytest.mark.skipif(not os.path.exists(REFERENCE_MSH),
                    reason="reference mesh asset unavailable")
def test_reference_domain_msh():
    # the reference's own gmsh asset: 121 nodes, 100 quads, ids 0-3
    # (domain.geo:26-30)
    m = read_msh(REFERENCE_MSH)
    assert m.n_vertices == 121
    assert m.n_cells == 100
    assert m.n_boundary_faces == 40
    assert sorted(np.unique(m.face_ids)) == [0, 1, 2, 3]
    s2 = build_fe_space(m, 2)
    assert s2.n_nodes == 441  # conforming 21x21-equivalent Q2 space
    # all cells positively oriented after ingestion
    from poroelasticity_dealii_tpu.ops.geometry import geometry_factors
    from poroelasticity_dealii_tpu.ops.quadrature import gauss_tensor
    pts, wts = gauss_tensor(2, 2)
    _, jxw = geometry_factors(m.vertices[m.cells], pts, wts)
    assert np.all(np.asarray(jxw) > 0)
    # total area = 100 m^2
    assert np.isclose(np.asarray(jxw).sum(), 100.0)


def test_q3_3d_face_orientation_consistency():
    """3D Q3: every cell's local lattice position must map to the stored
    global node coordinate — under RANDOM vertex relabeling, so shared
    faces are seen with all relative orientations (the orientation bug
    this catches: two cells disagreeing which face node sits at (i, j))."""
    import dataclasses

    import numpy as np

    from poroelasticity_dealii_tpu.mesh import hyper_rectangle
    from poroelasticity_dealii_tpu.mesh.qk import build_fe_space
    from poroelasticity_dealii_tpu.ops.shape import node_lattice, shape_tables

    base = hyper_rectangle((1.0, 1.0, 1.0), cells_per_axis=(3, 2, 2))
    rng = np.random.default_rng(11)
    perm = rng.permutation(base.n_vertices)          # new id of old vertex
    verts = np.empty_like(base.vertices)
    verts[perm] = base.vertices
    mesh = dataclasses.replace(base, vertices=verts,
                               cells=perm[base.cells.astype(np.int64)]
                               .astype(base.cells.dtype))

    for k in (2, 3, 4):
        space = build_fe_space(mesh, k)
        lat = node_lattice(k, 3).astype(np.float64) / k   # in [0,1]
        corner_xyz = mesh.vertices[mesh.cells]            # (E, 8, 3)
        # trilinear map of each lattice point
        w = np.stack([
            (1 - lat[:, 0]) * (1 - lat[:, 1]) * (1 - lat[:, 2]),
            lat[:, 0] * (1 - lat[:, 1]) * (1 - lat[:, 2]),
            (1 - lat[:, 0]) * lat[:, 1] * (1 - lat[:, 2]),
            lat[:, 0] * lat[:, 1] * (1 - lat[:, 2]),
            (1 - lat[:, 0]) * (1 - lat[:, 1]) * lat[:, 2],
            lat[:, 0] * (1 - lat[:, 1]) * lat[:, 2],
            (1 - lat[:, 0]) * lat[:, 1] * lat[:, 2],
            lat[:, 0] * lat[:, 1] * lat[:, 2]], axis=1)   # (NL, 8)
        expect = np.einsum("nv,evd->end", w, corner_xyz)  # (E, NL, 3)
        got = space.node_coords[space.cell_nodes.astype(np.int64)]
        np.testing.assert_allclose(got, expect, atol=1e-12)
        # every global node owned consistently (no duplicates at a point
        # with different ids within one cell)
        for c in range(mesh.n_cells):
            assert len(set(space.cell_nodes[c].tolist())) \
                == space.cell_nodes.shape[1]


def test_q3_3d_laplace_patch():
    """Q3 Laplace apply of a linear interpolant vanishes on interior nodes
    (orientation errors would leave nonzero residuals on face nodes)."""
    import numpy as np
    import jax.numpy as jnp

    from poroelasticity_dealii_tpu.mesh import hyper_rectangle
    from poroelasticity_dealii_tpu.mesh.qk import build_fe_space
    from poroelasticity_dealii_tpu.ops import operators as ops
    from poroelasticity_dealii_tpu.ops.geometry import geometry_factors
    from poroelasticity_dealii_tpu.ops.quadrature import gauss_tensor
    from poroelasticity_dealii_tpu.ops.shape import shape_tables

    mesh = hyper_rectangle((1.0, 1.0, 1.0), cells_per_axis=2)
    space = build_fe_space(mesh, 3)
    pts, wts = gauss_tensor(4, 3)
    jinv, jxw = geometry_factors(mesh.vertices[mesh.cells], pts, wts)
    jinv = jnp.moveaxis(jnp.asarray(jinv), 0, -1)
    jxw = jnp.moveaxis(jnp.asarray(jxw), 0, -1)
    _, dref = shape_tables(3, 3, pts)
    conn = jnp.asarray(np.ascontiguousarray(space.cell_nodes.T))
    x = space.node_coords
    f = jnp.asarray(1.0 + 2.0 * x[:, 0] - 3.0 * x[:, 1] + 0.5 * x[:, 2])
    y = np.asarray(ops.apply_laplace(f, conn, jnp.asarray(dref), jinv, jxw))
    # hyper_rectangle centers the domain: boundary at |x| = 0.5
    interior = np.all(np.abs(x) < 0.5 - 1e-9, axis=1)
    np.testing.assert_allclose(y[interior], 0.0, atol=1e-12)
