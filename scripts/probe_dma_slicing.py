"""Probe Mosaic DMA/addressing capabilities needed by the tiled render
kernel design:

  a) dynamic-offset DMA slice on a sublane (second-minor) dim   [expected ok]
  b) dynamic-offset DMA slice on the lane (minor) dim           [unknown]
  c) pltpu.roll with a dynamic (traced) lane shift              [unknown]
  d) in-VMEM dynamic_slice on the lane dim                      [unknown]

Each probe prints OK/FAIL with the error class, so the kernel can be built
on what the hardware actually supports.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 64, 1024          # lanes = W
SUB, LANE = 16, 256       # slice sizes


def run(name, fn, *args):
    try:
        out = np.asarray(fn(*args))
        print(f"{name:34s} OK   checksum={out.sum():.3f}", flush=True)
        return out
    except Exception as e:
        msg = str(e).replace("\n", " ")[:180]
        print(f"{name:34s} FAIL {type(e).__name__}: {msg}", flush=True)
        return None


x = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)


# ---- a) dynamic sublane-offset DMA --------------------------------------
def k_sub(off_ref, hbm_ref, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(off_ref[0], SUB), :], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[:] = scratch[:]


def probe_sublane(x, off):
    return pl.pallas_call(
        k_sub,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SUB, W), jnp.float32),
        scratch_shapes=[pltpu.VMEM((SUB, W), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(off, x)


# ---- b) dynamic lane-offset DMA -----------------------------------------
def k_lane(off_ref, hbm_ref, out_ref, scratch, sem):
    dma = pltpu.make_async_copy(
        hbm_ref.at[:, pl.ds(off_ref[0], LANE)], scratch, sem)
    dma.start()
    dma.wait()
    out_ref[:] = scratch[:]


def probe_lane(x, off):
    return pl.pallas_call(
        k_lane,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((H, LANE), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(off, x)


# ---- c) dynamic lane roll in VMEM ---------------------------------------
def k_roll(off_ref, in_ref, out_ref):
    rolled = pltpu.roll(in_ref[:], -off_ref[0], 1)
    out_ref[:] = rolled[:, :LANE]


def probe_roll(x, off):
    return pl.pallas_call(
        k_roll,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, LANE), jnp.float32),
    )(off, x)


# ---- d) in-VMEM dynamic lane slice --------------------------------------
def k_dslice(off_ref, in_ref, out_ref):
    out_ref[:] = in_ref[:, pl.ds(off_ref[0], LANE)]


def probe_dslice(x, off):
    return pl.pallas_call(
        k_dslice,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, LANE), jnp.float32),
    )(off, x)


OFF_SUB = jnp.asarray([12], jnp.int32)       # not 8-aligned
OFF_LANE = jnp.asarray([40], jnp.int32)      # not 128-aligned

ref_sub = np.asarray(x)[12:12 + SUB, :]
ref_lane = np.asarray(x)[:, 40:40 + LANE]

o = run("a) sublane-offset DMA", jax.jit(probe_sublane), x, OFF_SUB)
if o is not None:
    print("   match:", np.allclose(o, ref_sub), flush=True)
o = run("b) lane-offset DMA", jax.jit(probe_lane), x, OFF_LANE)
if o is not None:
    print("   match:", np.allclose(o, ref_lane), flush=True)
o = run("c) dynamic lane roll", jax.jit(probe_roll), x, OFF_LANE)
if o is not None:
    print("   match:", np.allclose(o, ref_lane), flush=True)
o = run("d) in-VMEM dynamic lane slice", jax.jit(probe_dslice), x, OFF_LANE)
if o is not None:
    print("   match:", np.allclose(o, ref_lane), flush=True)
