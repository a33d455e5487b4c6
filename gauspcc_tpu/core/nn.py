"""Tiny functional NN helpers (dense layers / 2-layer MLPs as pytrees)."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def dense_init(key, fan_in: int, fan_out: int) -> dict:
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / np.sqrt(fan_in)
    return {
        "w": jax.random.uniform(k1, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (fan_out,), jnp.float32, -bound, bound),
    }


def dense(p: dict, x: jax.Array) -> jax.Array:
    return x @ p["w"] + p["b"]


def mlp2_init(key, d_in: int, d_hidden: int, d_out: int) -> dict:
    k1, k2 = jax.random.split(key)
    return {"fc0": dense_init(k1, d_in, d_hidden), "fc1": dense_init(k2, d_hidden, d_out)}


def mlp2(p: dict, x: jax.Array, out_act=None) -> jax.Array:
    h = jax.nn.relu(dense(p["fc0"], x))
    y = dense(p["fc1"], h)
    return out_act(y) if out_act is not None else y
