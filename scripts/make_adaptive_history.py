"""Generate + cross-validate the ADAPTIVE golden-history artifact.

The reference's golden ``input.data`` run interleaves Kelly refinement
every 5th step (``PoroelasticityFSS.h:333-340``); the uniform-mesh pin
(``tests/data/golden_history.json``) does not cover that cadence.  This
script runs the full 17-step adaptive golden deck through BOTH
implementations —

* the production jax AMR driver (``amr/driver.py``), and
* the independent assembled-scipy oracle with hanging-node condensation
  (``validation.run_adaptive_reference_algorithm``) —

asserts they agree step-for-step (mesh sequence, FSS iteration counts,
pressure inner-iteration counts, residual norms), and pins the agreed
history to ``tests/data/adaptive_golden_history.json``.

Usage:  python scripts/make_adaptive_history.py
"""

import dataclasses
import json
import os
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from poroelasticity_dealii_tpu.amr.driver import AMRSimulationRunner  # noqa
from poroelasticity_dealii_tpu.config import read_input_file  # noqa
from poroelasticity_dealii_tpu.validation import (  # noqa
    run_adaptive_reference_algorithm)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "data", "adaptive_golden_history.json")


def main():
    data = read_input_file("configs/golden_2d.data")
    data = dataclasses.replace(data, amr=True, output_vtk=False)

    print("# production adaptive run ...", file=sys.stderr)
    runner = AMRSimulationRunner(data)
    _, prod = runner.run()
    print("# oracle adaptive run ...", file=sys.stderr)
    ora = run_adaptive_reference_algorithm(data)

    assert len(prod) == len(ora) == 17, (len(prod), len(ora))
    pinned = []
    for hp, ho in zip(prod, ora):
        assert hp["n_cells"] == ho["n_cells"], (hp, ho)
        assert hp["n_pdofs"] == ho["n_pdofs"], (hp, ho)
        assert hp["fss"] == ho["fss_iterations"], (hp, ho)
        assert hp["press"] == ho["pressure_iterations"], (hp, ho)
        np.testing.assert_allclose(hp["err"], ho["pressure_error"],
                                   rtol=1e-5)
        pinned.append({
            "time": ho["time"],
            "n_cells": ho["n_cells"],
            "n_pdofs": ho["n_pdofs"],
            "fss_iterations": ho["fss_iterations"],
            "pressure_iterations": ho["pressure_iterations"],
            "pressure_error": ho["pressure_error"],
            "fss_error_history": ho["fss_error_history"],
        })
        print(f"  t={ho['time']:6.0f} cells={ho['n_cells']:5d} "
              f"fss={ho['fss_iterations']} press={ho['pressure_iterations']} "
              f"err={ho['pressure_error']:.3e}", file=sys.stderr)

    with open(OUT, "w") as fh:
        json.dump(pinned, fh, indent=1)
    print(f"# two-implementation agreement over 17 adaptive steps; "
          f"pinned -> {OUT}", file=sys.stderr)


if __name__ == "__main__":
    main()
