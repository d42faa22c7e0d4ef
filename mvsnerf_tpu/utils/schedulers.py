"""Learning-rate schedules matching reference get_scheduler (utils.py:678-694):
MultiStepLR / CosineAnnealing / poly, with optional gradual warmup."""

from __future__ import annotations

import optax


def make_lr_schedule(lrate: float, scheduler: str = "steplr",
                     decay_step=(5000, 8000, 9000), decay_gamma: float = 0.5,
                     num_steps: int = 10000, warmup_steps: int = 0,
                     poly_exp: float = 0.9, eta_min: float = 1e-8):
    """Returns an optax schedule fn step -> lr."""
    if scheduler == "steplr":
        boundaries = {int(s): decay_gamma for s in decay_step}
        base = optax.piecewise_constant_schedule(lrate, boundaries)
    elif scheduler == "cosine":
        base = optax.cosine_decay_schedule(lrate, num_steps, eta_min / lrate)
    elif scheduler == "poly":
        base = optax.polynomial_schedule(lrate, 0.0, poly_exp, num_steps)
    else:
        raise ValueError(f"unknown scheduler {scheduler}")
    if warmup_steps > 0:
        warm = optax.linear_schedule(0.0, lrate, warmup_steps)
        return optax.join_schedules([warm, base], [warmup_steps])
    return base
