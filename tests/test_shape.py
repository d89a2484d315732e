"""Shape-function and quadrature unit tests (SURVEY §4 unit tier)."""

import numpy as np

from poroelasticity_dealii_tpu.ops.quadrature import gauss_1d, gauss_tensor
from poroelasticity_dealii_tpu.ops.shape import (face_lattice_indices,
                                                 lagrange_nodes_1d,
                                                 node_lattice, shape_tables)


def test_gauss_exactness():
    for n in (1, 2, 3, 4):
        pts, wts = gauss_1d(n)
        for p in range(2 * n):
            exact = (1 - (-1) ** (p + 1)) / (p + 1)
            assert np.isclose((wts * pts ** p).sum(), exact), (n, p)


def test_gauss_tensor_weights_sum_to_volume():
    for dim in (1, 2, 3):
        pts, wts = gauss_tensor(3, dim)
        assert np.isclose(wts.sum(), 2.0 ** dim)
        assert pts.shape == (3 ** dim, dim)


def test_partition_of_unity_and_kronecker():
    rng = np.random.default_rng(0)
    for dim in (1, 2, 3):
        for k in (1, 2, 3):
            x = rng.uniform(-1, 1, size=(7, dim))
            phi, dphi = shape_tables(k, dim, x)
            np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-13)
            np.testing.assert_allclose(dphi.sum(axis=1), 0.0, atol=1e-12)
            # Kronecker delta at nodes
            lat = node_lattice(k, dim)
            nodes = lat / k * 2.0 - 1.0
            vals, _ = shape_tables(k, dim, nodes)
            np.testing.assert_allclose(vals, np.eye(lat.shape[0]), atol=1e-12)


def test_gradients_match_finite_differences():
    rng = np.random.default_rng(1)
    eps = 1e-6
    for dim in (2, 3):
        for k in (1, 2):
            x = rng.uniform(-0.9, 0.9, size=(5, dim))
            _, dphi = shape_tables(k, dim, x)
            for d in range(dim):
                xp = x.copy(); xp[:, d] += eps
                xm = x.copy(); xm[:, d] -= eps
                vp, _ = shape_tables(k, dim, xp)
                vm, _ = shape_tables(k, dim, xm)
                fd = (vp - vm) / (2 * eps)
                np.testing.assert_allclose(dphi[:, :, d], fd, atol=1e-8)


def test_face_lattices():
    for dim in (2, 3):
        for k in (1, 2):
            faces = face_lattice_indices(k, dim)
            lat = node_lattice(k, dim)
            assert len(faces) == 2 * dim
            for f, idx in enumerate(faces):
                d, side = divmod(f, 2)
                assert len(idx) == (k + 1) ** (dim - 1)
                assert np.all(lat[idx, d] == (0 if side == 0 else k))


def test_lagrange_nodes():
    np.testing.assert_allclose(lagrange_nodes_1d(2), [-1, 0, 1])
