"""Benchmark: wall-clock per fixed-stress time step at ~1M DOF (3D).

The BASELINE.json headline metric ("Wall-clock per timestep at 1M DOF").
Problem: 3D consolidation cube, Q2 displacement / Q1 pressure, 34^3 cells ->
985,527 displacement DOFs + 42,875 pressure DOFs (~1.03M total), float32 on
the available accelerator with correspondingly relaxed CG tolerances.

The reference publishes no numbers (README is 3 lines; its build is Debug —
see BASELINE.md), so ``vs_baseline`` is the measured speedup against the
recorded CPU wall-clock for the *identical* problem and solver
(BENCH_BASELINE.json, measured once with `python bench.py --cpu-baseline`) —
a deliberately strong stand-in for "deal.II + CPU" (multithreaded XLA CPU vs
the reference's serial Debug build).  North-star: vs_baseline >= 2.

Prints exactly ONE JSON line to stdout.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(HERE, "BENCH_BASELINE.json")

CELLS_PER_AXIS = 40          # -> 1,660,022 total DOFs (Q2 disp + Q1 press)
N_MEASURED_STEPS = 5


def build(platform=None, cells=CELLS_PER_AXIS):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    # x64 on: arrays stay float32, but CG dot products accumulate in f64
    # (f32 dots suffer catastrophic cancellation with strong preconditioners)
    jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache: the 3D conv kernels compile slowly cold
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.solvers import FixedStressSolver
    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization
    data = read_input_file(os.path.join(HERE, "configs/consolidation_3d.data"))
    data = dataclasses.replace(
        data, dtype="float32",
        flow_rate=1e-2,                            # keep the flow solve hot
        # tight enough that every step does real solver work in f32 (the
        # residual scale here is ~5e-4; looser absolute tolerances freeze
        # the fields after a few steps and the bench measures no-ops)
        fss_tol=2e-5, pressure_tol=2e-5,
        mech_cg_tol=1e-5, mech_cg_relative=True,
        pressure_cg_tol=1e-5, projection_cg_tol=1e-5)
    t0 = time.perf_counter()
    # multigrid off: warm-started CG needs only a handful of iterations at
    # these relative tolerances, and the GMG coarse-level conv graphs
    # currently fault the TPU Mosaic runtime at this size (known issue;
    # GMG is exercised in the f64/CPU test suite where it cuts cold-solve
    # iterations 264 -> 8)
    disc = build_grid_discretization(data, cells_per_axis=cells,
                                     multigrid="off")
    solver = FixedStressSolver(disc, data)
    setup_s = time.perf_counter() - t0
    n_dofs = disc.n_pdofs + disc.n_udofs
    print(f"# setup: {setup_s:.1f}s, cells={disc.n_cells}, dofs={n_dofs}",
          file=sys.stderr)
    return data, disc, solver, n_dofs


def measure(data, solver, n_steps=N_MEASURED_STEPS):
    t0 = time.perf_counter()
    state = solver.initial_state()
    state.p.block_until_ready()
    print(f"# initial_state (incl. compile): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    state, stats = solver.time_step(state, data.time_step)  # compile + run
    state.p.block_until_ready()
    print(f"# first step (incl. compile): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    times = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        state, stats = solver.time_step(state, data.time_step)
        state.p.block_until_ready()
        times.append(time.perf_counter() - t0)
        print(f"# step {i + 2}: {times[-1]*1e3:.1f} ms  "
              f"fss={int(stats.fss_iterations)} "
              f"press={int(stats.pressure_iterations)} "
              f"cg(p/u/proj)={int(stats.pressure_cg_iterations)}/"
              f"{int(stats.mech_cg_iterations)}/"
              f"{int(stats.projection_cg_iterations)} "
              f"err={float(stats.pressure_error):.2e}", file=sys.stderr)
    import numpy as np
    assert np.isfinite(float(stats.pressure_error))
    return sum(times) / len(times)


def breakdown(data, disc, solver):
    """Per-operator timings at bench scale (--breakdown): where a step's
    milliseconds go.  Diagnostic only — not part of the JSON metric."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    dt = data.time_step
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(disc.n_pdofs), disc.dtype)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    solver.time_step(solver.initial_state(), dt)   # warm per-dt caches
    fns = {
        "mass_apply": (lambda x: disc.mass(x), p),
        "laplace_apply": (lambda x: disc.laplace(x), p),
        "pressure_jacobian_fused": (
            lambda x: solver._pressure_jacobian_apply(x, dt), p),
        "elasticity_apply": (lambda x: disc.elasticity(x), u),
        "coupling_rhs": (lambda x: disc.coupling_rhs(x, data.biot_coef), p),
        "strain_projection_rhs": (
            lambda x: disc.strain_projection_rhs(x), u),
    }
    pre = solver._pressure_precond(dt)
    if pre is not None:
        fns["pressure_vcycle"] = (pre, p)
    for name, (f, x) in fns.items():
        jf = jax.jit(f)
        y = jf(x)
        jax.block_until_ready(y)
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            y = jf(x)
        jax.block_until_ready(y)
        ms = (time.perf_counter() - t0) / reps * 1e3
        print(f"# {name:26s} {ms:8.3f} ms", file=sys.stderr)


def main():
    if "--breakdown" in sys.argv:
        data, disc, solver, n_dofs = build()
        breakdown(data, disc, solver)
        return
    if "--cpu-baseline" in sys.argv:
        data, disc, solver, n_dofs = build(platform="cpu")
        ms = measure(data, solver, n_steps=2) * 1e3
        rec = {"cpu_ms_per_step": ms, "n_dofs": n_dofs,
               "cells_per_axis": CELLS_PER_AXIS,
               "note": "XLA:CPU, same problem/solver/tolerances as the TPU "
                       "bench; stand-in for the reference's serial CPU path"}
        with open(BASELINE_FILE, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(json.dumps(rec))
        return

    data, disc, solver, n_dofs = build()
    ms = measure(data, solver) * 1e3

    vs_baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            base = json.load(fh)
        if base.get("n_dofs") == n_dofs:
            vs_baseline = base["cpu_ms_per_step"] / ms
    print(json.dumps({
        "metric": "wall_clock_per_fss_timestep_1.66M_dof_3d",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
