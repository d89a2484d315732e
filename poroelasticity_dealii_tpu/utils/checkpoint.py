"""Checkpoint / resume.

The reference has no restart capability (state lives in memory only; SURVEY
§5).  The minimal restart vector is exactly what its ``SolutionTransfer``
carries across mesh changes — {p, eps_v, eps_v0} — plus u, strains, time and
step (``PoroelasticityFSS.h:474-497``).  Stored as a plain ``.npz`` (no
extra deps; orbax can be layered on later for async multi-host saves).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from ..solvers.fss import State

FORMAT_VERSION = 1


def save_checkpoint(path: str, state: State, time_: float, step: int,
                    meta: dict | None = None, forest=None):
    """``forest`` (optional): an amr.QuadForest whose leaves are persisted so
    adaptive runs resume on the refined mesh."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    extra = {}
    if forest is not None:
        extra["forest_leaves"] = np.asarray(sorted(forest.leaves),
                                            dtype=np.int64)
        extra["forest_lower"] = np.asarray(forest.lower)
        extra["forest_upper"] = np.asarray(forest.upper)
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
    OctForest for 3D — distinguished by the leaf-tuple width), or None."""
    with np.load(path) as z:
        if "forest_leaves" not in z:
            return None
        rows = z["forest_leaves"]
        if rows.shape[1] == 4:
            from ..amr.octforest import OctForest as cls
        else:
            from ..amr.forest import QuadForest as cls
        leaves = {tuple(int(v) for v in row) for row in rows}
        return cls(lower=z["forest_lower"], upper=z["forest_upper"],
                   leaves=leaves)
