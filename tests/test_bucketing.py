"""AMR shape bucketing (amr/bucketing.py): padded discretizations must be
float-EXACT vs unpadded, and different meshes in the same buckets must
produce identical solver-visible shapes (the property that turns XLA
recompiles into compile-cache hits)."""

import dataclasses

import numpy as np

import jax.numpy as jnp

from poroelasticity_dealii_tpu.amr.bucketing import (bucket_size,
                                                     pad_amr_discretization,
                                                     real_sizes)
from poroelasticity_dealii_tpu.amr.driver import (AMRSimulationRunner,
                                                  build_amr_discretization)
from poroelasticity_dealii_tpu.config import read_input_file

DECK = "configs/golden_2d.data"


def test_bucket_size_properties():
    for n in (0, 1, 31, 32, 33, 100, 376, 1537, 10_000):
        b = bucket_size(n)
        assert b > n                      # strictly: a phantom dof exists
        assert b % 32 == 0
    # monotone
    sizes = [bucket_size(n) for n in range(0, 2000, 7)]
    assert sizes == sorted(sizes)


def test_padded_adaptive_run_is_exact():
    """Two steps + a remesh + two more steps: bucketed on vs off gives the
    same mesh trajectory, iteration counts, and fields to fp roundoff."""
    data = read_input_file(DECK)
    data = dataclasses.replace(data, amr=True, output_vtk=False,
                               t_max=6 * data.time_step)
    outs = {}
    for bk in (False, True):
        r = AMRSimulationRunner(dataclasses.replace(data, amr_bucketing=bk))
        state, hist = r.run()
        st = r._real_state(state)
        outs[bk] = (np.asarray(st.p), np.asarray(st.u),
                    [h["n_cells"] for h in hist], [h["fss"] for h in hist])
    p0, u0, c0, f0 = outs[False]
    p1, u1, c1, f1 = outs[True]
    assert c0 == c1 and f0 == f1
    np.testing.assert_allclose(p1, p0, rtol=1e-13)
    np.testing.assert_allclose(u1, u0, atol=1e-15 * np.abs(u0).max())


def test_same_bucket_forests_share_shapes():
    """Two forests refining DIFFERENT cells (same counts) pad to identical
    solver-visible shapes — the reuse condition for the compile cache."""
    data = read_input_file(DECK)

    def shapes(which):
        r = AMRSimulationRunner(dataclasses.replace(
            data, amr=True, output_vtk=False))
        leaves = sorted(r.forest.leaves)
        r.forest.refine_and_coarsen([leaves[which]], [])
        r._rebuild()
        d = r.disc
        return (d.n_cells, d.n_pdofs, d.n_udofs,
                tuple(d._hcp.masters.shape), tuple(d._hcu.masters.shape))

    a, b = shapes(0), shapes(-1)
    assert a == b, (a, b)


def test_padded_sizes_and_real_sizes_disagree_only_by_padding():
    data = read_input_file(DECK)
    data = dataclasses.replace(data, amr=True)
    r = AMRSimulationRunner(data)
    leaves = sorted(r.forest.leaves)
    r.forest.refine_and_coarsen(leaves[:3], [])
    r._rebuild()
    d = r.disc
    n_p, n_u = real_sizes(d)
    assert d.n_pdofs > n_p and d.n_udofs > n_u
    # phantom dofs are constrained to zero with unit diagonals
    assert float(jnp.max(d.free_mask_p[n_p:])) == 0.0
    assert float(jnp.max(d.free_mask_u[n_u:])) == 0.0
    assert float(jnp.min(d.diag_mass[n_p:])) == 1.0
    assert float(jnp.min(d.diag_elasticity[n_u:])) == 1.0
    # phantom cells carry zero quadrature weight
    E_real = d.pressure_space.mesh.n_cells
    assert float(jnp.abs(d.jxw_p[:, E_real:]).max()) == 0.0
    assert float(jnp.abs(d.jxw_u[:, E_real:]).max()) == 0.0


def test_unpadded_build_unchanged():
    """bucketing off: the AMR discretization keeps real sizes exactly."""
    data = read_input_file(DECK)
    r = AMRSimulationRunner(dataclasses.replace(
        data, amr=True, amr_bucketing=False))
    d = r.disc
    n_p, n_u = real_sizes(d)
    assert d.n_pdofs == n_p and d.n_udofs == n_u


def test_pad_is_independent_of_which_cells_are_hanging():
    """Padding is exact on a genuinely hanging-node mesh: the padded
    operator applied to a padded vector equals the unpadded apply."""
    rng = np.random.default_rng(3)
    data = read_input_file(DECK)
    r = AMRSimulationRunner(dataclasses.replace(
        data, amr=True, amr_bucketing=False))
    leaves = sorted(r.forest.leaves)
    r.forest.refine_and_coarsen(leaves[:5], [])
    disc = build_amr_discretization(r.forest, data)
    padded = pad_amr_discretization(disc)
    n_p, n_u = real_sizes(disc)
    p = rng.standard_normal(n_p)
    u = rng.standard_normal(n_u)
    pp = jnp.pad(jnp.asarray(p), (0, padded.n_pdofs - n_p))
    up = jnp.pad(jnp.asarray(u), (0, padded.n_udofs - n_u))
    np.testing.assert_allclose(
        np.asarray(padded.mass(pp))[:n_p], np.asarray(disc.mass(jnp.asarray(p))),
        rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(padded.laplace(pp))[:n_p],
        np.asarray(disc.laplace(jnp.asarray(p))), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(padded.elasticity_constrained(up))[:n_u],
        np.asarray(disc.elasticity_constrained(jnp.asarray(u))),
        rtol=1e-12, atol=1e-6)
    # padded tails stay exactly zero (mass/laplace) — nothing leaks
    assert float(jnp.abs(padded.mass(pp)[n_p:]).max()) == 0.0


def test_bucketed_psum_sharded_adaptive_run():
    """Bucketing composes with 'Sharding = psum' (the one AMR-capable
    decomposition): the sharded bucketed adaptive run matches the
    unsharded unbucketed one."""
    import jax
    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    data = read_input_file(DECK)
    data = dataclasses.replace(data, amr=True, output_vtk=False,
                               t_max=6 * data.time_step)
    r0 = AMRSimulationRunner(dataclasses.replace(data, amr_bucketing=False))
    s0, h0 = r0.run()
    r1 = AMRSimulationRunner(dataclasses.replace(
        data, amr_bucketing=True, sharding="psum", n_devices=8))
    s1, h1 = r1.run()
    assert [h["n_cells"] for h in h0] == [h["n_cells"] for h in h1]
    np.testing.assert_allclose(np.asarray(s1.p), np.asarray(s0.p),
                               rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(s1.u), np.asarray(s0.u),
        atol=1e-13 * np.abs(np.asarray(s0.u)).max())
