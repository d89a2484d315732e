"""Pallas fused elasticity kernel vs the conv-stencil path (interpret mode
on CPU; the same kernel runs compiled on TPU — see bench notes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.ops.pallas_elasticity import (
    elasticity_element_matrix, make_pallas_elasticity, merge_parities,
    split_parities)
from poroelasticity_dealii_tpu.solvers.structured import \
    build_grid_discretization

DECK = "configs/consolidation_3d.data"


def test_parity_split_roundtrip():
    n = 3
    g = 2 * n + 1
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((g, g, g, 3)))
    np.testing.assert_allclose(merge_parities(split_parities(U, n), n), U)


@pytest.mark.parametrize("n,tz", [(4, 2), (6, 3)])
def test_pallas_elasticity_matches_conv(n, tz):
    data = read_input_file(DECK)
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), dtype=disc.dtype)
    ke = elasticity_element_matrix(data, n)
    apply_p = make_pallas_elasticity(ke, n, tz=tz, dtype=disc.dtype,
                                     interpret=True)
    y = np.asarray(apply_p(u))
    y_ref = np.asarray(disc.elasticity(u))
    scale = np.abs(y_ref).max()
    np.testing.assert_allclose(y, y_ref, atol=1e-11 * scale)


# ------------------------------------------------- comp-major kernel -----

def _cm_setup(n):
    from poroelasticity_dealii_tpu.mesh.generator import hyper_rectangle
    from poroelasticity_dealii_tpu.mesh.qk import build_fe_space
    from poroelasticity_dealii_tpu.ops import dense
    data = read_input_file("configs/consolidation_3d.data")
    h = [data.domain_size[d] / n for d in range(3)]
    su1 = build_fe_space(hyper_rectangle(h, cells_per_axis=1), 2)
    Ke = dense.elasticity_element_matrices(su1, data.lame_constant,
                                           data.shear_modulus)[0]
    disc = build_grid_discretization(data, cells_per_axis=n,
                                     multigrid="off")
    return Ke, disc


def test_comp_major_rows_roundtrip():
    from poroelasticity_dealii_tpu.ops.pallas_comp_major import (from_rows,
                                                                 to_rows)
    n = 3
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((2 * n + 1) ** 3 * 3))
    np.testing.assert_allclose(np.asarray(from_rows(to_rows(u, n), n)),
                               np.asarray(u))


def test_comp_major_reference_matches_conv():
    from poroelasticity_dealii_tpu.ops.pallas_comp_major import \
        make_reference_apply
    n = 4
    Ke, disc = _cm_setup(n)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), jnp.float64)
    y_ref = np.asarray(make_reference_apply(Ke, n, jnp.float64)(u))
    y_conv = np.asarray(disc.elasticity(jnp.asarray(u, disc.dtype)))
    np.testing.assert_allclose(y_ref, y_conv,
                               atol=1e-12 * np.abs(y_conv).max())


@pytest.mark.parametrize("n,tc", [(4, 2), (6, 4)])  # incl. tail block
def test_comp_major_pallas_interpret_matches_conv(n, tc):
    from poroelasticity_dealii_tpu.ops.pallas_comp_major import \
        make_pallas_apply
    Ke, disc = _cm_setup(n)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), jnp.float32)
    y = np.asarray(make_pallas_apply(Ke, n, jnp.float32, tc=tc,
                                     interpret=True)(u))
    y_conv = np.asarray(disc.elasticity(jnp.asarray(u, disc.dtype)))
    err = np.abs(y - y_conv).max() / np.abs(y_conv).max()
    assert err < 1e-5, err
