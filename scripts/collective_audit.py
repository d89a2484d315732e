"""Audit the collectives GSPMD inserts in the sharded conv-grid path.

For each grid size: compile (a) one elasticity apply, (b) a 5-iteration CG
loop on the constrained elasticity operator, on an 8-device virtual CPU
mesh, and report every collective op with its shape/byte volume.  The
question: do DOF vectors stay slab-sharded through the loop (collective
bytes = O(interface)) or does XLA re-gather full vectors per apply
(= O(volume))?
"""
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from poroelasticity_dealii_tpu.config import read_input_file
from poroelasticity_dealii_tpu.parallel import (make_device_mesh,
                                                shard_grid_discretization)
from poroelasticity_dealii_tpu.solvers.structured import \
    build_grid_discretization

DTYPE_BYTES = {"f32": 4, "f64": 8, "u32": 4, "s32": 4, "pred": 1, "bf16": 2}


def collective_report(hlo: str):
    """Sum bytes by collective kind from an HLO text dump."""
    out = {}
    for m in re.finditer(
            r"(\w[\w.\-]*) = (\w+)\[([\d,]*)\][^\n]*?"
            r"(all-gather|all-reduce|collective-permute|all-to-all|"
            r"reduce-scatter)", hlo):
        dt, shape_s, kind = m.group(2), m.group(3), m.group(4)
        n = 1
        for tok in shape_s.split(","):
            if tok:
                n *= int(tok)
        nbytes = n * DTYPE_BYTES.get(dt, 4)
        k = out.setdefault(kind, [0, 0])
        k[0] += 1
        k[1] += nbytes
    return out


def audit(cells):
    data = read_input_file("configs/golden_2d.data")
    # 3D problem to make interface (n^2) vs volume (n^3) scaling visible
    data = dataclasses.replace(
        data, dim=3, domain_size=(10.0, 10.0, 10.0),
        displacement_boundary_labels=(0, 1, 2, 3, 4, 5),
        displacement_boundary_components=(0, 0, 1, 1, 2, 2),
        displacement_boundary_values=(0, -1e-5, 0, -1e-5, 0, -1e-5))
    disc = build_grid_discretization(data, cells_per_axis=cells,
                                     backend="conv", multigrid="off")
    dmesh = make_device_mesh(8)
    sdisc = shard_grid_discretization(disc, dmesh)
    n_u = sdisc.n_udofs

    apply_c = jax.jit(sdisc.elasticity).lower(
        jnp.zeros(n_u, sdisc.dtype)).compile()

    def cg5(b):
        x = jnp.zeros_like(b)
        r = b
        p = r
        rs = jnp.vdot(r, r)
        def body(i, carry):
            x, r, p, rs = carry
            ap = sdisc.elasticity(p)
            alpha = rs / jnp.vdot(p, ap)
            x = x + alpha * p
            r = r - alpha * ap
            rs2 = jnp.vdot(r, r)
            p = r + (rs2 / rs) * p
            return x, r, p, rs2
        x, r, p, rs = jax.lax.fori_loop(0, 5, body, (x, r, p, rs))
        return x
    cg_c = jax.jit(cg5).lower(jnp.zeros(n_u, sdisc.dtype)).compile()

    for tag, comp in (("apply", apply_c), ("cg5", cg_c)):
        rep = collective_report(comp.as_text())
        total = sum(v[1] for v in rep.values())
        print(f"cells={cells:3d} n_udofs={n_u:8d} vec_bytes={n_u*8:9d} "
              f"{tag:5s} total_collective_bytes={total:10d}  " +
              "  ".join(f"{k}:{v[0]}x/{v[1]}B" for k, v in rep.items()))


if __name__ == "__main__":
    for cells in (8, 16):
        audit(cells)
