"""Small network utilities (parity with lib/networks/utils.py).

The reference ships a numerically-stable softmax pair and a CoordConv
concat whose implementation is broken (references an undefined helper,
utils.py:46-50); here CoordConv works.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_softmax_stable(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically stable log-softmax (lib/networks/utils.py:7-20 computed
    this by hand; jax.nn.log_softmax already subtracts the max)."""
    return jax.nn.log_softmax(x, axis=axis)


def softmax_stable(x: jax.Array, axis: int = -1) -> jax.Array:
    return jax.nn.softmax(x, axis=axis)


def concatenate_spatial_coordinates(x: jax.Array,
                                    normalize: bool = True) -> jax.Array:
    """CoordConv: append (y, x) coordinate channels to an NHWC feature map
    (lib/networks/utils.py:38-55 intent, fixed)."""
    b, h, w, _ = x.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    if normalize:
        ys = ys / max(h - 1, 1) * 2.0 - 1.0
        xs = xs / max(w - 1, 1) * 2.0 - 1.0
    coords = jnp.broadcast_to(jnp.stack([ys, xs], axis=-1)[None],
                              (b, h, w, 2)).astype(x.dtype)
    return jnp.concatenate([x, coords], axis=-1)
