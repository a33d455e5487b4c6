"""Per-group Adam with exponential lr schedules.

Parity: HAC's per-param-group optimizer (gaussian_model.py:493-592) and
get_expon_lr_func (utils/general_utils.py:49-83): log-lerped lr from init
to final over max_steps with an optional delayed warm-up multiplier, one
schedule per parameter group.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax


def expon_lr(lr_init, lr_final, max_steps, lr_delay_steps=0,
             lr_delay_mult=1.0, step_sub=0) -> Callable:
    """Returns f(step) -> lr (jnp), matching get_expon_lr_func."""

    def f(step):
        step = jnp.asarray(step, jnp.float32) - step_sub
        zero = (lr_init == 0.0) or (lr_final == 0.0)
        if zero:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(
            np.log(lr_init) * (1 - t) + np.log(lr_final) * t
        )
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return f


def group_adam(group_lr: dict[str, Callable], group_of_leaf: Callable,
               eps: float = 1e-15, b1: float = 0.9, b2: float = 0.999
               ) -> optax.GradientTransformation:
    """Adam whose step size per leaf is group_lr[group_of_leaf(path)](step).

    group_of_leaf: maps a key-path tuple to a group name present in
    group_lr (or None for frozen leaves -> zero update).
    """
    adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def init(params):
        return (adam.init(params), jnp.zeros([], jnp.int32))

    def update(grads, state, params=None):
        adam_state, step = state
        updates, adam_state = adam.update(grads, adam_state, params)
        step = step + 1

        def scale(path, u):
            g = group_of_leaf(path)
            if g is None:
                return jnp.zeros_like(u)
            return -group_lr[g](step) * u

        updates = jax.tree_util.tree_map_with_path(scale, updates)
        return updates, (adam_state, step)

    return optax.GradientTransformation(init, update)


def path_key(path) -> tuple:
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(p.key)
        elif hasattr(p, "idx"):
            out.append(p.idx)
        else:
            out.append(str(p))
    return tuple(out)
