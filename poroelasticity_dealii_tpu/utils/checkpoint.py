"""Checkpoint / resume.

The reference has no restart capability (state lives in memory only; SURVEY
§5).  The minimal restart vector is exactly what its ``SolutionTransfer``
carries across mesh changes — {p, eps_v, eps_v0} — plus u, strains, time and
step (``PoroelasticityFSS.h:474-497``).

Two interchangeable backends:

* ``.npz`` (default) — synchronous, dependency-free, one file;
* **orbax** (``TPU / Checkpoint format = orbax``) — asynchronous
  device-to-disk saves (the host enqueues the save and keeps stepping;
  multi-host/sharded-array ready).  A checkpoint path ending in ``.npz``
  loads via numpy, anything else via orbax, so resume auto-detects.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..solvers.fss import State

FORMAT_VERSION = 1


def _forest_payload(forest) -> dict:
    """Persistable arrays for any forest type (box quad/oct forests carry
    lower/upper; multi-root forests carry the coarse-mesh arrays)."""
    extra = {"forest_leaves": np.asarray(sorted(forest.leaves),
                                         dtype=np.int64)}
    if hasattr(forest, "root_cells"):       # MultiRootQuadForest
        extra["forest_mr_cells"] = np.asarray(forest.root_cells, np.int64)
        extra["forest_mr_coords"] = np.asarray(forest.root_coords, float)
        bids = sorted(forest.boundary_ids.items())
        extra["forest_mr_bids"] = np.asarray(
            [(r, s, i) for (r, s), i in bids], np.int64).reshape(-1, 3)
    else:
        extra["forest_lower"] = np.asarray(forest.lower)
        extra["forest_upper"] = np.asarray(forest.upper)
    return extra


def _forest_from_payload(z):
    rows = np.asarray(z["forest_leaves"])
    leaves = {tuple(int(v) for v in row) for row in rows}
    if "forest_mr_cells" in z:
        bids = {(int(r), int(s)): int(i)
                for r, s, i in np.asarray(z["forest_mr_bids"])}
        if rows.shape[1] == 5:              # (l, ix, iy, iz, root)
            from ..amr.multiroot3d import MultiRootOctForest as mr_cls
        else:                               # (l, ix, iy, root)
            from ..amr.multiroot import MultiRootQuadForest as mr_cls
        return mr_cls(
            root_cells=np.asarray(z["forest_mr_cells"]),
            root_coords=np.asarray(z["forest_mr_coords"]),
            boundary_ids=bids, leaves=leaves)
    if rows.shape[1] == 4:
        from ..amr.octforest import OctForest as cls
    else:
        from ..amr.forest import QuadForest as cls
    return cls(lower=np.asarray(z["forest_lower"]),
               upper=np.asarray(z["forest_upper"]), leaves=leaves)


def save_checkpoint(path: str, state: State, time_: float, step: int,
                    meta: dict | None = None, forest=None):
    """``forest`` (optional): an amr forest whose structure is persisted so
    adaptive runs resume on the refined mesh."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    extra = _forest_payload(forest) if forest is not None else {}
    np.savez(
        path,
        version=FORMAT_VERSION,
        p=np.asarray(state.p), u=np.asarray(state.u),
        eps_v=np.asarray(state.eps_v), eps_v0=np.asarray(state.eps_v0),
        strains=np.asarray(state.strains),
        time=time_, step=step,
        **extra,
        **({f"meta_{k}": v for k, v in (meta or {}).items()}),
    )


def load_checkpoint(path: str, dtype=None) -> Tuple[State, float, int]:
    import jax.numpy as jnp
    with np.load(path) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {z['version']}")
        cast = (lambda a: jnp.asarray(a, dtype=dtype)) if dtype \
            else jnp.asarray
        state = State(p=cast(z["p"]), u=cast(z["u"]),
                      eps_v=cast(z["eps_v"]), eps_v0=cast(z["eps_v0"]),
                      strains=cast(z["strains"]))
        return state, float(z["time"]), int(z["step"])


def load_checkpoint_forest(path: str):
    """Restore the persisted forest of an adaptive run (QuadForest for 2D,
    OctForest for 3D — distinguished by the leaf-tuple width — or
    MultiRootQuadForest when coarse-mesh arrays are present), or None."""
    with np.load(path) as z:
        if "forest_leaves" not in z:
            return None
        return _forest_from_payload(z)


# ---------------------------------------------------------------------------
# orbax backend (async, multi-host ready)
# ---------------------------------------------------------------------------

_ORBAX_MGRS = {}


def _orbax_checkpointer():
    import orbax.checkpoint as ocp
    key = "ckpt"
    if key not in _ORBAX_MGRS:
        _ORBAX_MGRS[key] = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ORBAX_MGRS[key]


def save_checkpoint_orbax(path: str, state: State, time_: float, step: int,
                          forest=None):
    """Asynchronous orbax save: returns immediately; the device arrays are
    snapshotted and written in the background (call
    :func:`wait_for_checkpoints` before process exit)."""
    payload = {
        "version": FORMAT_VERSION,
        "p": state.p, "u": state.u,
        "eps_v": state.eps_v, "eps_v0": state.eps_v0,
        "strains": state.strains,
        "time": float(time_), "step": int(step),
    }
    if forest is not None:
        payload.update(_forest_payload(forest))
    ckptr = _orbax_checkpointer()
    ckptr.save(os.path.abspath(path), payload, force=True)


def wait_for_checkpoints():
    """Block until all pending async orbax saves are durable."""
    for c in _ORBAX_MGRS.values():
        c.wait_until_finished()


def _load_orbax(path: str):
    import orbax.checkpoint as ocp
    with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
        return ckptr.restore(os.path.abspath(path))


def load_checkpoint_any(path: str, dtype=None) -> Tuple[State, float, int]:
    """Resume from either backend: .npz via numpy, directories via orbax."""
    if path.endswith(".npz"):
        return load_checkpoint(path, dtype)
    import jax.numpy as jnp
    z = _load_orbax(path)
    if int(z["version"]) != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {z['version']}")
    cast = (lambda a: jnp.asarray(a, dtype=dtype)) if dtype else jnp.asarray
    state = State(p=cast(z["p"]), u=cast(z["u"]), eps_v=cast(z["eps_v"]),
                  eps_v0=cast(z["eps_v0"]), strains=cast(z["strains"]))
    return state, float(z["time"]), int(z["step"])


def load_checkpoint_forest_any(path: str):
    if path.endswith(".npz"):
        return load_checkpoint_forest(path)
    z = _load_orbax(path)
    if "forest_leaves" not in z:
        return None
    return _forest_from_payload(z)
