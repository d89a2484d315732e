"""Probe Mosaic support for the 2-D dataflow patterns the comp-major
Pallas elasticity kernel needs. Each probe compiles+runs a tiny kernel."""
import traceback
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def run(name, fn):
    try:
        fn()
        print(f"PASS  {name}")
    except Exception as e:
        msg = str(e).splitlines()[0][:110]
        print(f"FAIL  {name}: {msg}")

# P1: dynamic 2-D HBM->VMEM DMA row range + matmul (known-good baseline)
def p1():
    def k(x_hbm, w_ref, o_ref, scratch, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * 64, 64)], scratch, sem)
        dma.start(); dma.wait()
        o_ref[...] = jnp.dot(scratch[...], w_ref[...],
                             preferred_element_type=jnp.float32)
    x = jnp.ones((128, 256), jnp.float32); w = jnp.ones((256, 128), jnp.float32)
    out = pl.pallas_call(k, grid=(2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((256, 128), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, 256), jnp.float32),
                        pltpu.SemaphoreType.DMA])(x, w)
    jax.block_until_ready(out)

# P2: static shifted 2-D slices + concat along sublanes
def p2():
    def k(x_ref, o_ref):
        a = x_ref[0:32, 0:128]
        b = x_ref[16:48, 128:256]
        o_ref[...] = jnp.concatenate([a, b], axis=0)
    x = jnp.ones((64, 256), jnp.float32)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec((64, 256), lambda: (0, 0))],
        out_specs=pl.BlockSpec((64, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(x)
    jax.block_until_ready(out)

# P3: in-kernel reshape merging minor dims (27, 40, 40) -> (27, 1600)
def p3():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(32, 1600)
    x = jnp.ones((32, 40, 40), jnp.float32)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec((32, 40, 40), lambda: (0, 0, 0))],
        out_specs=pl.BlockSpec((32, 1600), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((32, 1600), jnp.float32))(x)
    jax.block_until_ready(out)

# P4: lane-strided slice x[:, 0::2] (comp de-interleave)
def p4():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...][:, 0::2]
    x = jnp.ones((64, 256), jnp.float32)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec((64, 256), lambda: (0, 0))],
        out_specs=pl.BlockSpec((64, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32))(x)
    jax.block_until_ready(out)

# P5: accumulate 27 shifted windows from a (48, 1664) plane into (40, 1600)
# via static slices + adds (the gather side of a 2-D stencil)
def p5():
    def k(x_ref, o_ref):
        acc = jnp.zeros((40, 1600), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + x_ref[dy:dy + 40, dx * 8:dx * 8 + 1600]
        o_ref[...] = acc
    x = jnp.ones((48, 1664), jnp.float32)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec((48, 1664), lambda: (0, 0))],
        out_specs=pl.BlockSpec((40, 1600), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((40, 1600), jnp.float32))(x)
    jax.block_until_ready(out)

# P6: transpose (81, 1600) -> (1600, 81) in-kernel (operand orientation)
def p6():
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...].T
    x = jnp.ones((128, 1600), jnp.float32)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec((128, 1600), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1600, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1600, 128), jnp.float32))(x)
    jax.block_until_ready(out)

# P7: matmul with non-128 contraction dim (1600, 81) @ (81, 96)
def p7():
    def k(x_ref, w_ref, o_ref):
        o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                             preferred_element_type=jnp.float32)
    x = jnp.ones((1600, 81), jnp.float32); w = jnp.ones((81, 96), jnp.float32)
    out = pl.pallas_call(k,
        in_specs=[pl.BlockSpec((1600, 81), lambda: (0, 0)),
                  pl.BlockSpec((81, 96), lambda: (0, 0))],
        out_specs=pl.BlockSpec((1600, 96), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1600, 96), jnp.float32))(x, w)
    jax.block_until_ready(out)

for nm, f in [("P1 dyn-2D-DMA + matmul", p1),
              ("P2 shifted 2D slices + concat", p2),
              ("P3 reshape (32,40,40)->(32,1600)", p3),
              ("P4 lane-strided slice [:,0::2]", p4),
              ("P5 27-window shifted-slice accumulate", p5),
              ("P6 in-kernel transpose", p6),
              ("P7 matmul contraction=81", p7)]:
    run(nm, f)
