"""Generate tests/data/history_3d_level4.json — the at-scale 3D FSS
convergence-history artifact (round-2 verdict item 4b).

Runs BOTH implementations of the reference algorithm on the 3D
consolidation deck at refinement level 4 (16^3 cells, 112,724 DOFs —
``configs/consolidation_3d.data`` is otherwise unchanged, reference
tolerances: fss/pressure 1e-8, mech CG 1e-12 abs, pressure/projection CG
1e-8 rel):

* the independent scipy assembled-sparse oracle
  (``poroelasticity_dealii_tpu/validation.py``), and
* the production jax solver (generic path, f64, CPU),

asserts their per-step FSS iteration counts, pressure-solve counts and
residual norms agree, and pins both.  tests/test_history_3d.py replays
the production solver against the pin in CI; the oracle side is recorded
here so the pin is a two-implementation agreement, not a self-regression
(same contract as tests/data/golden_history.json).

Usage: python scripts/make_history_3d.py
"""

import json

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from poroelasticity_dealii_tpu.config import read_input_file  # noqa: E402
from poroelasticity_dealii_tpu.mesh import hyper_rectangle  # noqa: E402
from poroelasticity_dealii_tpu.solvers import (  # noqa: E402
    FixedStressSolver, build_discretization)
from poroelasticity_dealii_tpu.validation import \
    run_reference_algorithm  # noqa: E402

LEVEL = 4
OUT = "tests/data/history_3d_level4.json"


def main():
    import dataclasses
    data = read_input_file("configs/consolidation_3d.data")
    data = dataclasses.replace(data, initial_refinement_level=LEVEL)

    oracle = run_reference_algorithm(data)

    mesh = hyper_rectangle(data.domain_size, LEVEL)
    disc = build_discretization(mesh, data)
    solver = FixedStressSolver(disc, data)
    state = solver.initial_state()
    prod = []
    t = 0.0
    while t < data.t_max:
        t += data.time_step
        state, s = solver.time_step(state, data.time_step)
        hist = [float(x) for x in np.asarray(s.fss_error_history) if x >= 0]
        prod.append({
            "time": t,
            "fss_iterations": int(s.fss_iterations),
            "pressure_iterations": int(s.pressure_iterations),
            "pressure_error": float(s.pressure_error),
            "fss_error_history": hist,
        })

    assert len(oracle) == len(prod)
    for o, p in zip(oracle, prod):
        assert o["fss_iterations"] == p["fss_iterations"], (o, p)
        assert o["pressure_iterations"] == p["pressure_iterations"], (o, p)
        np.testing.assert_allclose(o["pressure_error"], p["pressure_error"],
                                   rtol=1e-6)
        np.testing.assert_allclose(o["fss_error_history"],
                                   p["fss_error_history"], rtol=1e-6)

    rec = {
        "deck": "configs/consolidation_3d.data",
        "level": LEVEL,
        "n_dofs": disc.n_pdofs + disc.n_udofs,
        "note": "two-implementation agreement at generation time: "
                "scipy assembled-sparse oracle == production jax solver "
                "(reference tolerances, f64)",
        "oracle": oracle,
        "production": prod,
    }
    with open(OUT, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(f"wrote {OUT}: {len(prod)} steps, {rec['n_dofs']} DOFs, "
          "oracle == production")


if __name__ == "__main__":
    main()
