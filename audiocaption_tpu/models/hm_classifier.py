"""Human/machine caption discriminator (TPU re-design of
captioning/models/hm_classifier.py:25-61): GRU over caption word
embeddings -> pooled -> sigmoid head.  Accepts either token ids or a
soft one-hot distribution (hm_classifier.py:52-55), which is what the
ConditionLossWrapper feeds through the straight-through/gumbel path
(losses/loss.py:129-161).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from audiocaption_tpu.models.layers import GRU, torch_linear_init
from audiocaption_tpu.ops.masking import mean_with_lens

Array = jnp.ndarray


class HmClassifier(nn.Module):
    vocab_size: int
    emb_dim: int = 256
    hidden_size: int = 256

    @nn.compact
    def __call__(self, cap: Array, cap_len: Array,
                 train: bool = False) -> Array:
        """cap: [B, L] int ids or [B, L, V] soft one-hot -> logits [B]."""
        table = self.param("word_embedding",
                           nn.initializers.xavier_uniform(),
                           (self.vocab_size, self.emb_dim))
        if cap.ndim == 3:
            emb = cap @ table                     # soft one-hot input
        else:
            emb = table[cap]
        out, _ = GRU(hidden_size=self.hidden_size, bidirectional=True,
                     name="rnn")(emb, cap_len, train=train)
        pooled = mean_with_lens(out, cap_len)
        logit = nn.Dense(1, kernel_init=torch_linear_init,
                         name="classifier")(pooled)
        return logit[:, 0]
