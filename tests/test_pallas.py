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
