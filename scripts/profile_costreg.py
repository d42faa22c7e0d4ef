"""Per-layer profile of the CostRegNet 3D U-Net at DTU scale, plus layout
experiments (NDHWC conv3d vs z-decomposed 2D convs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from mvsnerf_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

from mvsnerf_tpu.models import init_mvsnet
from mvsnerf_tpu.models.mvsnet import cost_reg_apply
from mvsnerf_tpu.models.layers import abn, conv3d, conv_transpose3d

D, HP, WP = 128, 176, 208

rng = np.random.default_rng(0)
mvs = init_mvsnet(jax.random.PRNGKey(0))
p = mvs["cost_reg_2"]
x = jnp.asarray(rng.standard_normal((1, D, HP, WP, 41)).astype(np.float32))


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.2f} ms", flush=True)
    return out


timeit("full costreg fwd", jax.jit(lambda p, x: cost_reg_apply(p, x)), p, x)

# per-layer
conv0 = timeit("conv0 (41->8, s1, full res)", jax.jit(
    lambda p_, x_: abn(p_["conv0"]["bn"],
                       conv3d(p_["conv0"]["conv"], x_, 1, 1))), p, x)
c1 = timeit("conv1 (8->16, s2)", jax.jit(
    lambda p_, x_: abn(p_["conv1"]["bn"],
                       conv3d(p_["conv1"]["conv"], x_, 2, 1))), p, conv0)
c2 = timeit("conv2 (16->16, s1)", jax.jit(
    lambda p_, x_: abn(p_["conv2"]["bn"],
                       conv3d(p_["conv2"]["conv"], x_, 1, 1))), p, c1)
c3 = timeit("conv3 (16->32, s2)", jax.jit(
    lambda p_, x_: abn(p_["conv3"]["bn"],
                       conv3d(p_["conv3"]["conv"], x_, 2, 1))), p, c2)
c4 = timeit("conv4 (32->32, s1)", jax.jit(
    lambda p_, x_: abn(p_["conv4"]["bn"],
                       conv3d(p_["conv4"]["conv"], x_, 1, 1))), p, c3)
c5 = timeit("conv5 (32->64, s2)", jax.jit(
    lambda p_, x_: abn(p_["conv5"]["bn"],
                       conv3d(p_["conv5"]["conv"], x_, 2, 1))), p, c4)
c6 = timeit("conv6 (64->64, s1)", jax.jit(
    lambda p_, x_: abn(p_["conv6"]["bn"],
                       conv3d(p_["conv6"]["conv"], x_, 1, 1))), p, c5)
d7 = timeit("deconv7 (64->32)", jax.jit(
    lambda p_, x_: abn(p_["conv7"]["bn"],
                       conv_transpose3d(p_["conv7"]["deconv"], x_))), p, c6)
d9 = timeit("deconv9 (32->16)", jax.jit(
    lambda p_, x_: abn(p_["conv9"]["bn"],
                       conv_transpose3d(p_["conv9"]["deconv"], x_))),
    p, c4 + d7)
d11 = timeit("deconv11 (16->8)", jax.jit(
    lambda p_, x_: abn(p_["conv11"]["bn"],
                       conv_transpose3d(p_["conv11"]["deconv"], x_))),
    p, c2 + d9)


# ---- experiment: conv0 as z-decomposed 2D convs ---------------------------
def conv0_2d(p_, x_):
    """3x3x3 conv = sum over 3 z-offsets of 2D 3x3 convs; implemented as one
    2D conv over z-stacked channels (41*3 = 123 -> pads to 128 lanes)."""
    k = p_["conv0"]["conv"]["kernel"]              # (3,3,3,41,8)
    b, d, h, w, c = x_.shape
    xz = jnp.pad(x_, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    # (B*D, H, W, 3*C): channels = [z-1, z, z+1]
    stacked = jnp.concatenate([xz[:, :-2], xz[:, 1:-1], xz[:, 2:]], axis=-1)
    stacked = stacked.reshape(b * d, h, w, 3 * c)
    k2 = k.transpose(0, 1, 2, 3, 4).reshape(3, 3, 3, c, 8)
    # kernel z-major: (kz, ky, kx, c, o) -> (ky, kx, kz*c, o)
    k2 = k.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * c, 8)
    y = jax.lax.conv_general_dilated(
        stacked, k2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y.reshape(b, d, h, w, 8)
    return abn(p_["conv0"]["bn"], y)


out2d = timeit("conv0 as z-stacked 2D conv", jax.jit(conv0_2d), p, x)
err = float(jnp.max(jnp.abs(out2d - conv0)))
print(f"  max|err| vs conv3d: {err:.2e}")

# bf16 variant
timeit("conv0 3d bf16", jax.jit(
    lambda p_, x_: abn(p_["conv0"]["bn"],
                       conv3d({"kernel":
                               p_["conv0"]["conv"]["kernel"].astype(
                                   jnp.bfloat16)},
                              x_.astype(jnp.bfloat16), 1, 1)
                       .astype(jnp.float32))), p, x)
