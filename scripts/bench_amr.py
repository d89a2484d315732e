"""Adaptive-run wall-clock recorder (round-2 verdict item 5).

Runs the reference's own AMR configuration — the golden 2D deck with
refine-every-5, levels 4..6 (``PoroelasticityFSS.h:333-340``) — through
the AMR driver on the current jax backend and prints a per-step record
separating steady solve steps from remesh steps (estimate + mark +
rebuild + transfer + recompile), plus per-operator apply times at the
run's final mesh size (the "is the generic path acceptable at reference
AMR sizes" ablation: compare against the step budget).

Usage: python scripts/bench_amr.py [--platform cpu] [--sharding psum]
Prints one JSON line at the end.

``--sharding psum`` runs the SAME adaptive schedule with the element-psum
decomposition active (the only sharding that supports hanging nodes,
``amr/driver.py``), so the output carries a sharded adaptive wall-clock
next to the unsharded one — on the 8-virtual-device CPU mesh this is the
"psum is within X% at AMR sizes" measurement (round-3 verdict item 8).
"""

import json
import sys
import time

import jax

if "--platform" in sys.argv:
    jax.config.update("jax_platforms",
                      sys.argv[sys.argv.index("--platform") + 1])
jax.config.update("jax_enable_x64", True)

import dataclasses  # noqa: E402

import numpy as np  # noqa: E402

from poroelasticity_dealii_tpu.amr.driver import \
    AMRSimulationRunner  # noqa: E402
from poroelasticity_dealii_tpu.config import read_input_file  # noqa: E402


def main():
    sharding = (sys.argv[sys.argv.index("--sharding") + 1]
                if "--sharding" in sys.argv else "none")
    data = read_input_file("configs/golden_2d.data")
    data = dataclasses.replace(
        data, amr=True, refine_every=5, output_vtk=False, sharding=sharding,
        mech_cg_tol=1e-8, mech_cg_relative=True)  # see VALIDATION.md: the
    # reference-default ABSOLUTE 1e-12 sits below the f64 floor on refined
    # meshes and spins mechanics CG to the cap; relative 1e-8 is the
    # documented production setting
    runner = AMRSimulationRunner(data)
    state = runner.solver.initial_state()
    t, step = 0.0, 0
    steady, remesh = [], []
    import jax.numpy as jnp  # noqa: F401
    while t < data.t_max:
        t += data.time_step
        step += 1
        t0 = time.perf_counter()
        did_remesh = bool(data.refine_every
                          and step % data.refine_every == 0)
        if did_remesh:
            state = runner._remesh(state)
        t_remesh = time.perf_counter() - t0
        t0 = time.perf_counter()
        state, stats = runner.solver.time_step(state, data.time_step)
        state.p.block_until_ready()
        wall = time.perf_counter() - t0
        rec = {"step": step, "n_cells": runner.disc.pressure_space.mesh.n_cells,
               "solve_ms": round(wall * 1e3, 1),
               "fss": int(stats.fss_iterations)}
        if did_remesh:
            rec["remesh_s"] = round(t_remesh, 2)   # incl. recompile
            remesh.append(rec)
        else:
            steady.append(rec)
        print(f"# {rec}", file=sys.stderr)

    # ablation: per-operator apply time at the final AMR mesh (generic
    # gather/scatter path) vs the step budget
    disc = runner.disc
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    p = jnp.asarray(rng.standard_normal(disc.n_pdofs), disc.dtype)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    ops = {}
    for name, f, x in (("mass", disc.mass, p), ("laplace", disc.laplace, p),
                       ("elasticity", disc.elasticity, u),
                       ("projection_rhs", disc.strain_projection_rhs, u)):
        jf = jax.jit(f)
        jax.block_until_ready(jf(x))
        reps = 20
        t0 = time.perf_counter()
        y = None
        for _ in range(reps):
            y = jf(x)
        jax.block_until_ready(y)
        ops[name] = round((time.perf_counter() - t0) / reps * 1e3, 3)

    warm = [r["solve_ms"] for r in steady[1:]]
    print(json.dumps({
        "metric": "amr_golden_2d_adaptive_run",
        "backend": jax.default_backend(),
        "sharding": sharding,
        "n_devices": jax.device_count(),
        "steps": step,
        "final_n_cells": runner.disc.pressure_space.mesh.n_cells,
        "steady_solve_ms_median": round(float(np.median(warm)), 1),
        "steady_solve_ms_max": round(float(np.max(warm)), 1),
        "remesh_steps": remesh,
        "generic_op_apply_ms_at_final_mesh": ops,
    }))


if __name__ == "__main__":
    main()
