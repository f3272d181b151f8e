"""SpecAugment (torchlibrosa-style stripe dropping) in pure JAX.

Matches torchlibrosa.augmentation.SpecAugmentation semantics as used by
the reference encoders (cnn_encoder.py:352-353, applied only in training
with specaug=True): per sample, ``stripes_num`` stripes per axis, each
with width ~ U[0, drop_width) and offset ~ U[0, dim - width).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _drop_stripes(key: jax.Array, x: jnp.ndarray, axis: int,
                  drop_width: int, stripes_num: int) -> jnp.ndarray:
    """x: [B, T, F]; drops stripes along ``axis`` independently per sample."""
    B = x.shape[0]
    dim = x.shape[axis]
    coords = jnp.arange(dim)
    mask = jnp.ones((B, dim), dtype=bool)
    for i in range(stripes_num):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        distance = jax.random.randint(k1, (B,), 0, drop_width)
        bgn = jax.random.randint(k2, (B,), 0, jnp.maximum(dim - distance, 1))
        stripe = (coords[None, :] >= bgn[:, None]) & \
                 (coords[None, :] < (bgn + distance)[:, None])
        mask = mask & ~stripe
    shape = [B, 1, 1]
    shape[axis] = dim
    return x * mask.reshape(shape).astype(x.dtype)


def spec_augment(key: jax.Array, lms: jnp.ndarray,
                 time_drop_width: int = 64, time_stripes_num: int = 2,
                 freq_drop_width: int = 8, freq_stripes_num: int = 2
                 ) -> jnp.ndarray:
    """lms: [B, T, F] log-mel; returns augmented copy."""
    k1, k2 = jax.random.split(key)
    x = _drop_stripes(k1, lms, 1, time_drop_width, time_stripes_num)
    x = _drop_stripes(k2, x, 2, freq_drop_width, freq_stripes_num)
    return x
