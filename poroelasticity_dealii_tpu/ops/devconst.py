"""Setup-time device constants: cast on the host, transfer once.

``jnp.asarray(np_f64_array, f32_dtype)`` dispatches a ``convert_element_type``
op on the accelerator — one tiny XLA compile per distinct shape (~0.45 s
each through the TPU tunnel, always below the persistent-cache threshold so
re-paid every process start).  Round-5 profile of the 512^2 2D setup: 37
such compiles = 17 s, plus 18 s of device->host pulls from feeding jnp
arrays to numpy setup code.  Every setup-time constant should be built in
numpy and moved with :func:`device_const` — a pure transfer, no compile.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def device_const(a, dtype) -> jax.Array:
    """Host-cast ``a`` to ``dtype`` and transfer it (no XLA compile).

    ``a`` must be host data (numpy / list / scalar) — passing a jax array
    would pull it device->host first, which is exactly the setup cost this
    helper exists to avoid (callers keep the numpy originals around)."""
    if isinstance(a, jax.Array):
        raise TypeError(
            "device_const is for HOST setup constants; got a jax.Array "
            "(pass the numpy original instead of pulling it back)")
    return jax.device_put(np.ascontiguousarray(np.asarray(a, jnp.dtype(dtype))))
