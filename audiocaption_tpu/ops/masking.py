"""Length-mask primitives.

Padded variable-length batches are the framework-wide convention: every
ragged tensor travels as ``(data, lens)`` where ``data`` is padded to a
static shape and ``lens`` gives the valid prefix per row.  These helpers
mirror the semantics of the reference's pooling/masking utilities
(captioning/utils/model_util.py:29-81) as pure jnp functions that fuse
into surrounding XLA programs.
"""

from __future__ import annotations

import jax.numpy as jnp


def length_mask(lens: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """Boolean mask [N, max_length]: True where position < lens[n].

    Mirrors generate_length_mask (model_util.py:29-39) with a static
    ``max_length`` (required under jit).
    """
    lens = jnp.asarray(lens)
    idxs = jnp.arange(max_length, dtype=lens.dtype)
    return idxs[None, :] < lens[:, None]


def mean_with_lens(features: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over axis 1. features: [N, T, ...], lens: [N].

    Matches mean_with_lens (model_util.py:41-63): the sum over valid
    positions is divided by ``lens`` (not by the padded T).
    """
    lens = jnp.asarray(lens)
    mask = length_mask(lens, features.shape[1])
    mask = mask.reshape(mask.shape + (1,) * (features.ndim - 2))
    total = jnp.sum(features * mask.astype(features.dtype), axis=1)
    denom = lens.astype(features.dtype).reshape(
        lens.shape + (1,) * (total.ndim - 1))
    return total / denom


def max_with_lens(features: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Masked max over axis 1. features: [N, T, ...], lens: [N].

    Matches max_with_lens (model_util.py:66-81): padded positions are
    -inf so they never win.
    """
    lens = jnp.asarray(lens)
    mask = length_mask(lens, features.shape[1])
    mask = mask.reshape(mask.shape + (1,) * (features.ndim - 2))
    neg = jnp.asarray(-jnp.inf, dtype=features.dtype)
    return jnp.max(jnp.where(mask, features, neg), axis=1)


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray,
                   axis: int = -1, fill: float = -1e10) -> jnp.ndarray:
    """Softmax with invalid positions filled with a large negative value.

    ``fill=-1e10`` reproduces the reference attention masking constant
    (hf_wrapper.py Seq2SeqAttention / rnn_decoder.py:105-108).
    """
    import jax.nn
    scores = jnp.where(mask, scores, jnp.asarray(fill, scores.dtype))
    return jax.nn.softmax(scores, axis=axis)
