"""AMR tests: forest mechanics, hanging-node correctness (patch tests),
Kelly estimator, solution transfer, and an adaptive end-to-end run."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from poroelasticity_dealii_tpu.amr import QuadForest, kelly_estimate
from poroelasticity_dealii_tpu.amr.constraints import build_hanging_constraints
from poroelasticity_dealii_tpu.amr.driver import (AMRSimulationRunner,
                                                  build_amr_discretization)
from poroelasticity_dealii_tpu.amr.kelly import fixed_fraction_marks
from poroelasticity_dealii_tpu.amr.transfer import transfer_nodal
from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.solvers import FixedStressSolver

GOLDEN = "configs/golden_2d.data"


def _one_refined_forest(level=2):
    f = QuadForest.uniform([-5, -5], [5, 5], level)
    n = 2 ** level
    f.refine_and_coarsen({(level, 0, 0)}, set())
    return f


# ---------------------------------------------------------------- forest --

def test_uniform_forest_mesh():
    f = QuadForest.uniform([-5, -5], [5, 5], 3)
    m = f.to_mesh()
    assert m.n_cells == 64 and m.n_vertices == 81
    records, _ = f.interior_faces()
    assert len(records) == 2 * 8 * 7  # conforming interior faces


def test_refine_creates_hanging_mesh():
    f = _one_refined_forest(2)
    assert len(f.leaves) == 16 - 1 + 4
    m = f.to_mesh()
    assert m.n_cells == 19
    # 5x5 grid + 5 new fine vertices (incl 2 hanging, 1 center, 2 boundary)
    assert m.n_vertices == 25 + 5


def test_one_irregularity_enforced():
    f = QuadForest.uniform([0, 0], [1, 1], 1)  # 2x2
    # refine one cell twice: second refinement must drag neighbors along
    f.refine_and_coarsen({(1, 0, 0)}, set())
    f.refine_and_coarsen({(2, 0, 0)}, set())
    levels = {}
    for l, ix, iy in f.leaves:
        levels.setdefault(l, 0)
        levels[l] += 1
    # all neighbor level differences <= 1
    for leaf in f.leaves:
        for nb in f.neighbors_coarser(leaf):
            assert leaf[0] - nb[0] <= 1, (leaf, nb)


def test_coarsen_rejoins_siblings():
    f = QuadForest.uniform([0, 0], [1, 1], 2)
    f.refine_and_coarsen({(2, 0, 0)}, set())
    n_after_refine = len(f.leaves)
    kids = {(3, 0, 0), (3, 1, 0), (3, 0, 1), (3, 1, 1)}
    f.refine_and_coarsen(set(), kids)
    assert len(f.leaves) == n_after_refine - 3
    assert (2, 0, 0) in f.leaves


# ------------------------------------------------------- patch tests -----

@pytest.fixture(scope="module")
def amr_problem():
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, initial_refinement_level=2)
    forest = _one_refined_forest(2)
    disc = build_amr_discretization(forest, data)
    return data, forest, disc


def test_hanging_constraints_exist(amr_problem):
    _, _, disc = amr_problem
    assert not disc.hc_p.empty
    assert not disc.hc_u.empty
    # 2 hanging coarse edges around the refined cell
    assert disc.hc_p.hanging.shape[0] == 2
    assert disc.hc_u.hanging.shape[0] == 2 * 3 * 2  # 3 rows/edge * 2 comps


def test_laplace_patch_test(amr_problem):
    """Constrained Laplace of a linear field must vanish on interior master
    dofs (linear fields are exactly representable iff constraints are
    right)."""
    _, _, disc = amr_problem
    coords = disc.pressure_space.node_coords
    p_lin = jnp.asarray(1.0 + 2.0 * coords[:, 0] - 3.0 * coords[:, 1])
    p_lin = disc.hc_p.distribute(p_lin)  # consistent hanging values
    y = disc.hc_p.condense_vec(disc.laplace(p_lin))
    # nonzero only on boundary rows (natural bc residual); interior masters 0
    interior = (
        (np.abs(coords[:, 0]) < 5 - 1e-9) & (np.abs(coords[:, 1]) < 5 - 1e-9))
    interior &= ~np.isin(np.arange(disc.n_pdofs),
                         np.asarray(disc.hc_p.hanging))
    np.testing.assert_allclose(np.asarray(y)[interior], 0.0, atol=1e-12)


def test_mechanics_patch_test(amr_problem):
    """Full constrained mechanics solve with Dirichlet data from a linear
    displacement field reproduces that field exactly (the FEM patch test)."""
    data, forest, disc = amr_problem
    A = np.array([[2e-6, 1e-6], [-5e-7, 3e-6]])
    coords = disc.displacement_space.node_coords
    u_exact = (coords @ A.T).reshape(-1)

    # impose the exact field on the whole boundary
    on_b = ((np.abs(coords[:, 0]) > 5 - 1e-9) |
            (np.abs(coords[:, 1]) > 5 - 1e-9))
    free = np.repeat(~on_b, 2).astype(float)
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
    np.testing.assert_allclose(np.asarray(u), u_exact, rtol=1e-7,
                               atol=1e-12)


# ---------------------------------------------------------------- kelly --

def test_kelly_zero_for_linear_field(amr_problem):
    _, forest, disc = amr_problem
    coords = disc.pressure_space.node_coords
    p_lin = 2.0 * coords[:, 0] - 0.5 * coords[:, 1] + 1.0
    eta = kelly_estimate(forest, disc.pressure_space.mesh, p_lin)
    np.testing.assert_allclose(eta, 0.0, atol=1e-12)


def test_kelly_flags_rough_region():
    f = QuadForest.uniform([-5, -5], [5, 5], 3)
    m = f.to_mesh()
    # kink at x = 0: |x| has a gradient jump there
    p = np.abs(m.vertices[:, 0])
    eta = kelly_estimate(f, m, p)
    leaves = f.sorted_leaves()
    refine, _ = fixed_fraction_marks(f, eta, 0.6, 0.4, 0, 10)
    # all marked cells touch the kink line
    for l, ix, iy in refine:
        n = 2 ** l
        x0 = -5 + 10 * ix / n
        x1 = -5 + 10 * (ix + 1) / n
        assert x0 <= 0 <= x1 + 1e-12, (ix, x0, x1)


# ------------------------------------------------------------- transfer --

def test_transfer_linear_exact():
    f_old = _one_refined_forest(2)
    m_old = f_old.to_mesh()
    vals = 3.0 * m_old.vertices[:, 0] - 2.0 * m_old.vertices[:, 1]
    f_new = QuadForest(f_old.lower, f_old.upper, set(f_old.leaves))
    f_new.refine_and_coarsen({(2, 3, 3)}, set())
    m_new = f_new.to_mesh()
    out = transfer_nodal(f_old, m_old, vals, m_new.vertices)
    expect = 3.0 * m_new.vertices[:, 0] - 2.0 * m_new.vertices[:, 1]
    np.testing.assert_allclose(out, expect, atol=1e-12)


# ----------------------------------------------------------- end-to-end --

def test_adaptive_golden_run():
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(data, initial_refinement_level=3,
                               max_refinement_level=5, t_max=600.0,
                               amr=True)
    runner = AMRSimulationRunner(data)
    n0 = runner.disc.n_cells
    state, history = runner.run()
    # the well (center) region must have been refined
    assert runner.disc.n_cells > n0
    assert all(np.isfinite(h["err"]) for h in history)
    assert all(h["err"] < data.fss_tol for h in history)
    p = np.asarray(state.p)
    assert p.min() > 0.99 * data.p_init and p.max() < 1.2 * data.p_init
    # refined cells concentrate near the well: finest cells within r < 3
    mesh = runner.disc.pressure_space.mesh
    finest = max(l for l, _, _ in runner.forest.leaves)
    if finest > data.initial_refinement_level:
        for (l, ix, iy) in runner.forest.leaves:
            if l == finest:
                n = 2 ** l
                cx = -5 + 10 * (ix + 0.5) / n
                cy = -5 + 10 * (iy + 0.5) / n
                assert np.hypot(cx, cy) < 4.0, (cx, cy)


def test_amr_checkpoint_resume(tmp_path):
    """Adaptive runs persist the forest: resume restores the refined mesh
    and reproduces the uninterrupted run."""
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data, initial_refinement_level=3, max_refinement_level=5,
        t_max=480.0, amr=True, output_vtk=False, checkpoint_every=6,
        checkpoint_directory=str(tmp_path / "ck"))
    runner_full = AMRSimulationRunner(data)
    state_full, hist = runner_full.run()
    assert (tmp_path / "ck" / "ckpt-000006.npz").exists()
    # resume after the remesh at step 5 (checkpoint at step 6)
    runner_res = AMRSimulationRunner(data)
    state_res, _ = runner_res.run(
        resume_from=str(tmp_path / "ck" / "ckpt-000006.npz"))
    assert runner_res.forest.leaves == runner_full.forest.leaves
    np.testing.assert_allclose(np.asarray(state_res.p),
                               np.asarray(state_full.p), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(state_res.eps_v),
                               np.asarray(state_full.eps_v), rtol=1e-10)


def test_amr_runner_applies_psum_sharding(tmp_path):
    """'TPU / Sharding = psum' reaches the AMR driver (round-3 review
    finding: it was silently ignored): the built discretization is the
    sharded one, re-applied after remeshes; other modes raise."""
    import dataclasses

    from poroelasticity_dealii_tpu.amr.driver import AMRSimulationRunner
    from poroelasticity_dealii_tpu.parallel.sharding import \
        ShardedDiscretization
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data, amr=True, refine_every=2, output_vtk=False,
        initial_refinement_level=2, t_max=3 * data.time_step,
        output_directory=str(tmp_path), sharding="psum", n_devices=8)
    runner = AMRSimulationRunner(data)
    assert isinstance(runner.disc, ShardedDiscretization)
    state, history = runner.run()
    assert isinstance(runner.disc, ShardedDiscretization)  # post-remesh
    assert np.isfinite(np.asarray(state.p)).all()
    assert len(history) == 3

    data_bad = dataclasses.replace(data, sharding="ghost")
    with pytest.raises(NotImplementedError):
        AMRSimulationRunner(data_bad)
