"""Matmul precision policy.

TPU's default f32 matmul truncates operands to bf16 (one MXU pass). That is
the right trade for big conv/feature matmuls, but it is measurably wrong for
*coordinate* math and for the tiny NeRF MLP:

- plane-sweep grids came out 0.27 px off at DTU resolution (640x512, pad 24)
  vs the f32 reference — a real resampling-quality bug;
- the v0 MLP's multiplicative pts_bias cascade amplified bf16 rounding to
  ~0.4 absolute rgb error on the mvsnerf-v0 weights.

`matmul_f32` forces full-precision passes for those sites. Coordinate
matmuls are (N,3)@(3,3)-shaped — MXU time is negligible either way.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Interpolation-weight matmul precision (the banded gather/splat factor
# matrices): 'high' = 3 bf16 passes, enough for sub-1e-3-px coordinates;
# 'highest' = 6 passes, full f32. Overridable for experiments.
_LEVELS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}

# Banded gather/splat factor matmuls (ops/volume_grad, ops/warp_fast).
# Measured on v5e at the fine-tune workload (1024x128 samples, D=128 vol):
#   default: 41.0k rays/s, 1.0e-2 max feature err / 0.4% grad err vs f32
#   high:    27.2k rays/s, 7.9e-5 max err
#   highest: 19.6k rays/s, 4.8e-7 max err
# Training tolerates the default-level error (the trainable volume adapts to
# the sampling operator; eval paths use exact gathers), so speed wins here.
INTERP = _LEVELS[os.environ.get("MVSNERF_TPU_INTERP_PRECISION", "default")]

# The NeRF MLP runs at full precision by default: TPU bf16 matmuls amplify
# through the multiplicative pts_bias cascade to ~0.9 abs rgb error ('high'
# gives 6e-3, 'highest' 7e-5 vs the f32 reference).
MLP = _LEVELS[os.environ.get("MVSNERF_TPU_MLP_PRECISION", "highest")]


# Coordinate/geometry matmuls are always full f32 — they are (N,3)@(3,3)
# shaped, so the extra passes are free, and bf16 coordinates shift sampling
# positions by visible fractions of a pixel.
COORD = jax.lax.Precision.HIGHEST


def matmul_f32(a, b):
    """jnp.matmul at full f32 precision (use for coordinate/geometry math)."""
    return jnp.matmul(a, b, precision=COORD)
