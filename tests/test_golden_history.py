"""Fixed-stress convergence-history regression + non-circular
cross-validation.

The golden 2D run's per-step iteration counts and residuals are pinned as
a committed artifact (the BASELINE.md 'matching fixed-stress convergence
history' metric), and the pin is validated from BOTH sides:

* the production jax solver reproduces it
  (test_golden_fss_history_matches_recorded), and
* an independent assembled-sparse scipy re-execution of the reference
  algorithm (poroelasticity_dealii_tpu/validation.py — explicit
  scipy.sparse matrices per PoroElasticPressureSolver.h:96-101 /
  PoroElasticDisplacementSolver.h:237-242, scipy CG at the reference
  tolerances, the FSS loop of PoroelasticityFSS.h:347-407) reproduces the
  SAME history (test_reference_rerun_matches_recorded) — so the pin is a
  two-implementation agreement, not a self-regression."""

import dataclasses
import json

import numpy as np

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.solvers import (FixedStressSolver,
                                               build_discretization)
from poroelasticity_dealii_tpu.mesh import hyper_rectangle

GOLDEN = "configs/golden_2d.data"
HISTORY = "tests/data/golden_history.json"


def test_golden_fss_history_matches_recorded():
    with open(HISTORY) as fh:
        recorded = json.load(fh)
    data = read_input_file(GOLDEN)
    mesh = hyper_rectangle(data.domain_size, data.initial_refinement_level)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    state = solver.initial_state()
    t = 0.0
    for rec in recorded:
        t += data.time_step
        state, s = solver.time_step(state, data.time_step)
        assert int(s.fss_iterations) == rec["fss_iterations"], t
        assert int(s.pressure_iterations) == rec["pressure_iterations"], t
        np.testing.assert_allclose(float(s.pressure_error),
                                   rec["pressure_error"], rtol=1e-6)
        hist = [float(x) for x in np.asarray(s.fss_error_history) if x >= 0]
        np.testing.assert_allclose(hist, rec["fss_error_history"], rtol=1e-6)
    assert abs(t - 1020.0) < 1e-9  # 17 steps, like the reference's loop


def test_reference_rerun_matches_recorded():
    """The independent scipy re-execution of the reference algorithm
    reproduces the pinned history: per-step FSS iteration counts and
    pressure-solve counts EXACTLY, residual norms to ~1e-9 relative."""
    from poroelasticity_dealii_tpu.validation import run_reference_algorithm
    with open(HISTORY) as fh:
        recorded = json.load(fh)
    data = read_input_file(GOLDEN)
    hist = run_reference_algorithm(data)
    assert len(hist) == len(recorded) == 17
    for h, r in zip(hist, recorded):
        assert h["fss_iterations"] == r["fss_iterations"], h["time"]
        assert h["pressure_iterations"] == r["pressure_iterations"], h["time"]
        np.testing.assert_allclose(h["pressure_error"], r["pressure_error"],
                                   rtol=1e-6)
        np.testing.assert_allclose(h["fss_error_history"],
                                   r["fss_error_history"], rtol=1e-6)


def test_oracle_vs_production_with_tractions():
    """The oracle covers Neumann faces too: a traction-loaded variant of
    the golden deck (top load replaced by value*n_y stress BC) produces
    identical FSS/pressure iteration counts and matching residual norms
    in both implementations."""
    from poroelasticity_dealii_tpu.validation import run_reference_algorithm
    data = read_input_file(GOLDEN)
    data = dataclasses.replace(
        data,
        # rollers left/bottom, compression tractions right/top
        displacement_boundary_labels=(0, 2),
        displacement_boundary_components=(0, 1),
        displacement_boundary_values=(0.0, 0.0),
        stress_boundary_labels=(1, 3),
        stress_boundary_components=(0, 1),
        stress_boundary_values=(-2.5e6, -2.5e6))
    oracle = run_reference_algorithm(data, n_steps=3)
    mesh = hyper_rectangle(data.domain_size, data.initial_refinement_level)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    state = solver.initial_state()
    for o in oracle:
        state, s = solver.time_step(state, data.time_step)
        assert int(s.fss_iterations) == o["fss_iterations"]
        assert int(s.pressure_iterations) == o["pressure_iterations"]
        np.testing.assert_allclose(float(s.pressure_error),
                                   o["pressure_error"], rtol=1e-6)
