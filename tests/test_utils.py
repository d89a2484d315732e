"""Utility-layer tests: checkpointing, logging, profiling, VTK."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from poroelasticity_dealii_tpu.solvers.fss import State, StepStats
from poroelasticity_dealii_tpu.utils.checkpoint import (load_checkpoint,
                                                        save_checkpoint)
from poroelasticity_dealii_tpu.utils.logging_utils import RunLogger
from poroelasticity_dealii_tpu.utils.profiling import PhaseTimer


def _state(n=7):
    rng = np.random.default_rng(0)
    return State(p=jnp.asarray(rng.standard_normal(n)),
                 u=jnp.asarray(rng.standard_normal(2 * n)),
                 eps_v=jnp.asarray(rng.standard_normal(n)),
                 eps_v0=jnp.asarray(rng.standard_normal(n)),
                 strains=jnp.asarray(rng.standard_normal((3, n))))


def test_checkpoint_roundtrip(tmp_path):
    st = _state()
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, st, time_=123.5, step=7, meta={"note": "x"})
    st2, t, step = load_checkpoint(path)
    assert t == 123.5 and step == 7
    for a, b in zip(st, st2):
        if a is None:        # derived caches (u_rows) are not persisted
            assert b is None
            continue
        np.testing.assert_allclose(a, b)


def test_checkpoint_version_guard(tmp_path):
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, _state(), 0.0, 0)
    data = dict(np.load(path))
    data["version"] = 999
    np.savez(path, **data)
    with pytest.raises(ValueError):
        load_checkpoint(path)


def test_run_logger_jsonl(tmp_path):
    path = str(tmp_path / "log.jsonl")
    logger = RunLogger(path, echo=False)
    stats = StepStats(
        fss_iterations=jnp.int32(1), pressure_error=jnp.float64(1e-9),
        pressure_iterations=jnp.int32(3),
        pressure_cg_iterations=jnp.int32(10),
        mech_cg_iterations=jnp.int32(20),
        projection_cg_iterations=jnp.int32(5),
        fss_error_history=jnp.asarray([1e-9, -1.0, -1.0]),
        cg_converged=jnp.bool_(True))
    logger.log_step(1, 60.0, stats, 0.01, extra={"n_cells": 4})
    logger.close()
    rec = json.loads(open(path).read())
    assert rec["fss_iterations"] == 1
    assert rec["cg_iterations"] == {"pressure": 10, "mechanics": 20,
                                    "projection": 5}
    assert rec["fss_error_history"] == [1e-9]
    assert rec["n_cells"] == 4


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert "a" in t.report()


def test_sync_every_chained_runner_matches_default(tmp_path):
    """TPU / Sync every = N defers host syncs (logging, VTK, checks) to
    every Nth step; results and run-log contents must match the per-step
    default exactly."""
    import dataclasses
    import json
    import numpy as np
    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.models.runner import SimulationRunner

    data = read_input_file("configs/golden_2d.data")
    base = dataclasses.replace(data, t_max=300.0, output_vtk=False)
    runs = {}
    for name, n in (("sync1", 1), ("sync3", 3)):
        d = dataclasses.replace(
            base, sync_every=n, output_directory=str(tmp_path / name))
        import os
        os.makedirs(d.output_directory, exist_ok=True)
        state = SimulationRunner(d).run()
        log = [json.loads(line) for line in
               open(tmp_path / name / "run_log.jsonl")]
        runs[name] = (state, log)
    s1, l1 = runs["sync1"]
    s3, l3 = runs["sync3"]
    np.testing.assert_array_equal(np.asarray(s1.p), np.asarray(s3.p))
    np.testing.assert_array_equal(np.asarray(s1.u), np.asarray(s3.u))
    assert len(l1) == len(l3) == 5
    for a, b in zip(l1, l3):
        for key in ("step", "time", "fss", "press", "cg_p", "cg_u"):
            if key in a:
                assert a[key] == b[key], key


def test_orbax_checkpoint_roundtrip_and_resume(tmp_path):
    """'TPU / Checkpoint format = orbax': async saves, resume matches the
    npz path bitwise."""
    import dataclasses
    import numpy as np
    from poroelasticity_dealii_tpu.config import read_input_file
    from poroelasticity_dealii_tpu.models.runner import SimulationRunner
    from poroelasticity_dealii_tpu.utils.checkpoint import (
        load_checkpoint_any, wait_for_checkpoints)

    data = read_input_file("configs/golden_2d.data")
    base = dataclasses.replace(
        data, t_max=360.0, output_vtk=False, checkpoint_every=3)
    d_orb = dataclasses.replace(
        base, checkpoint_format="orbax",
        output_directory=str(tmp_path / "orb"),
        checkpoint_directory=str(tmp_path / "orb_ck"))
    d_npz = dataclasses.replace(
        base, output_directory=str(tmp_path / "npz"),
        checkpoint_directory=str(tmp_path / "npz_ck"))
    import os
    for d in (d_orb, d_npz):
        os.makedirs(d.output_directory, exist_ok=True)
    s_orb = SimulationRunner(d_orb).run()
    wait_for_checkpoints()
    s_npz = SimulationRunner(d_npz).run()
    # both backends produced step-3 checkpoints with identical contents
    st_o, t_o, k_o = load_checkpoint_any(
        str(tmp_path / "orb_ck" / "ckpt-000003"))
    st_n, t_n, k_n = load_checkpoint_any(
        str(tmp_path / "npz_ck" / "ckpt-000003.npz"))
    assert (t_o, k_o) == (t_n, k_n)
    np.testing.assert_array_equal(np.asarray(st_o.p), np.asarray(st_n.p))
    np.testing.assert_array_equal(np.asarray(st_o.u), np.asarray(st_n.u))
    # resume from the orbax checkpoint reproduces the uninterrupted run
    d_res = dataclasses.replace(
        d_orb, output_directory=str(tmp_path / "res"))
    os.makedirs(d_res.output_directory, exist_ok=True)
    s_res = SimulationRunner(d_res).run(
        resume_from=str(tmp_path / "orb_ck" / "ckpt-000003"))
    np.testing.assert_array_equal(np.asarray(s_res.p), np.asarray(s_orb.p))
