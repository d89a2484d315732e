"""Distributed equivalence tests (SURVEY §4 distributed tier): the same
problem on 1 vs N shards must agree to fp tolerance, on a simulated
8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.mesh import hyper_rectangle
from poroelasticity_dealii_tpu.parallel import (make_device_mesh,
                                                shard_discretization)
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)

GOLDEN = "configs/golden_2d.data"

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    data = read_input_file(GOLDEN)
    mesh = hyper_rectangle(data.domain_size, 3)  # 64 cells / 8 devices
    disc = build_discretization(mesh, data)
    dmesh = make_device_mesh(8)
    sdisc = shard_discretization(disc, dmesh)
    return data, disc, sdisc


def test_sharded_operator_applies_match(setup):
    data, disc, sdisc = setup
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(disc.n_pdofs))
    u = jnp.asarray(rng.standard_normal(disc.n_udofs))
    np.testing.assert_allclose(sdisc.mass(p), disc.mass(p), rtol=1e-13)
    np.testing.assert_allclose(sdisc.laplace(p), disc.laplace(p),
                               rtol=1e-12, atol=1e-13)
    ref = disc.elasticity(u)
    np.testing.assert_allclose(sdisc.elasticity(u), ref,
                               rtol=1e-12, atol=1e-6 * np.abs(ref).max())
    np.testing.assert_allclose(sdisc.coupling_rhs(p, data.biot_coef),
                               disc.coupling_rhs(p, data.biot_coef),
                               rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(sdisc.strain_projection_rhs(u),
                               disc.strain_projection_rhs(u),
                               rtol=1e-12, atol=1e-13)


def test_sharded_padding_is_inert(setup):
    """64 cells over 8 devices pads by 0; re-shard over 7 to force padding."""
    data, disc, _ = setup
    dmesh = make_device_mesh(7)
    sdisc = shard_discretization(disc, dmesh)
    assert sdisc.conn_p.shape[-1] == 70  # padded from 64
    p = jnp.asarray(np.random.default_rng(1).standard_normal(disc.n_pdofs))
    np.testing.assert_allclose(sdisc.mass(p), disc.mass(p), rtol=1e-13)


def test_full_time_step_1_vs_8_shards(setup):
    data, disc, sdisc = setup
    solver_1 = FixedStressSolver(disc, data)
    solver_8 = FixedStressSolver(sdisc, data)
    st1 = solver_1.initial_state()
    st8 = solver_8.initial_state()
    np.testing.assert_allclose(st8.u, st1.u, atol=1e-14)
    np.testing.assert_allclose(st8.eps_v, st1.eps_v, rtol=1e-8, atol=1e-18)
    a1, s1 = solver_1.time_step(st1, data.time_step)
    a8, s8 = solver_8.time_step(st8, data.time_step)
    # same convergence history structure
    assert int(s1.fss_iterations) == int(s8.fss_iterations)
    assert int(s1.pressure_iterations) == int(s8.pressure_iterations)
    np.testing.assert_allclose(a8.p, a1.p, rtol=1e-10)
    np.testing.assert_allclose(a8.u, a1.u, atol=1e-13)
    np.testing.assert_allclose(a8.eps_v, a1.eps_v, rtol=1e-8, atol=1e-18)


def test_sharded_conv_grid_full_step():
    """Spatial GSPMD sharding of the structured conv path: XLA partitions
    the stencil convs and inserts halo exchanges; the full FSS step must
    match the unsharded run exactly."""
    import dataclasses
    from poroelasticity_dealii_tpu.parallel import shard_grid_discretization
    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization

    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, initial_refinement_level=4)
    disc = build_grid_discretization(data, cells_per_axis=16, backend="conv",
                                     multigrid="off")
    dmesh = make_device_mesh(8)
    sdisc = shard_grid_discretization(disc, dmesh)
    s0 = FixedStressSolver(disc, data)
    s1 = FixedStressSolver(sdisc, data)
    st0, st1 = s0.initial_state(), s1.initial_state()
    np.testing.assert_allclose(np.asarray(st1.u), np.asarray(st0.u),
                               atol=1e-14)
    a0, t0 = s0.time_step(st0, data.time_step)
    a1, t1 = s1.time_step(st1, data.time_step)
    assert int(t0.fss_iterations) == int(t1.fss_iterations)
    np.testing.assert_allclose(np.asarray(a1.p), np.asarray(a0.p),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a1.u), np.asarray(a0.u),
                               atol=1e-13)
    # the compiled step really contains halo exchanges
    import jax
    f = jax.jit(lambda x: sdisc.elasticity(x))
    hlo = f.lower(st1.u).compile().as_text()
    assert ("collective-permute" in hlo) or ("all-gather" in hlo)


def test_sharded_conv_grid_anisotropic():
    """GSPMD slab sharding on an anisotropic grid: the wrapper reshapes
    (z, y, x) with per-axis extents; operator applies must match the
    unsharded conv path exactly."""
    import dataclasses

    import jax.numpy as jnp

    from poroelasticity_dealii_tpu.parallel import shard_grid_discretization
    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization

    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, domain_size=(10.0, 5.0))
    disc = build_grid_discretization(data, cells_per_axis=(16, 8),
                                     backend="conv", multigrid="off")
    dmesh = make_device_mesh(8)
    sdisc = shard_grid_discretization(disc, dmesh)
    rng = np.random.default_rng(4)
    p = jnp.asarray(rng.standard_normal(disc.n_pdofs), disc.dtype)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    import jax
    # sharding constraints live inside jit in real use (GSPMD pads
    # non-divisible slabs there; eager constraints are strict)
    lap_s = jax.jit(lambda x: sdisc.laplace(x))
    ela_s = jax.jit(lambda x: sdisc.elasticity(x))
    prj_s = jax.jit(lambda x: sdisc.strain_projection_rhs(x))
    ela_ref = np.asarray(disc.elasticity(u))
    np.testing.assert_allclose(np.asarray(lap_s(p)),
                               np.asarray(disc.laplace(p)), atol=1e-13)
    np.testing.assert_allclose(np.asarray(ela_s(u)), ela_ref,
                               atol=1e-8 * float(np.abs(ela_ref).max()))
    np.testing.assert_allclose(np.asarray(prj_s(u)),
                               np.asarray(disc.strain_projection_rhs(u)),
                               atol=1e-13)


def test_sharded_amr_mesh_1_vs_8():
    """AMR meshes shard through the psum element path: hanging-node
    constraints ride along replicated, so a refined (1-irregular) forest
    mesh produces the same step sharded as unsharded (round-3: lifts the
    round-2 'AMR cannot shard at all' gap; the interface-scaled ghost
    path still rejects AMR and defers to this mode)."""
    from poroelasticity_dealii_tpu.amr import QuadForest
    from poroelasticity_dealii_tpu.amr.driver import build_amr_discretization

    data = read_input_file(GOLDEN)
    f = QuadForest.uniform([-5, -5], [5, 5], 2)
    # refine an off-center block -> genuine hanging nodes
    f.refine_and_coarsen([leaf for leaf in f.leaves
                          if leaf[1] == 0 and leaf[2] == 0], [])
    disc = build_amr_discretization(f, data)
    assert disc.hc_p is not None and not disc.hc_p.empty
    sdisc = shard_discretization(disc, make_device_mesh(8))
    assert sdisc.hc_p is disc.hc_p and sdisc.hc_u is disc.hc_u
    s1 = FixedStressSolver(disc, data)
    s8 = FixedStressSolver(sdisc, data)
    a1, t1 = s1.time_step(s1.initial_state(), data.time_step)
    a8, t8 = s8.time_step(s8.initial_state(), data.time_step)
    assert int(t1.fss_iterations) == int(t8.fss_iterations)
    np.testing.assert_allclose(np.asarray(a8.p), np.asarray(a1.p),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(a8.u), np.asarray(a1.u),
                               rtol=1e-7,
                               atol=1e-12 * np.abs(np.asarray(a1.u)).max())
