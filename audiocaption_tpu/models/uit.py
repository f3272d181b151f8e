"""UIT audio vision-transformer encoders (TPU re-design of
captioning/models/uit.py): a patch-embed ViT over the log-mel
spectrogram image with pre-norm transformer blocks, mean-pooled clip
embedding and a per-timestep sequence embedding from frequency-mean of
the patch grid.  Size variants mirror the reference's uit_xs/xxs/xxxs
family (uit.py:253-660).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models.layers import (
    BatchNorm, LayerNorm, torch_linear_init)
from audiocaption_tpu.ops.masking import mean_with_lens

Array = jnp.ndarray

UIT_VARIANTS = {
    # embed_dim, depth, num_heads
    "uit_xxxs": (128, 6, 4),
    "uit_xxs": (192, 8, 6),
    "uit_xs": (256, 10, 8),
    "uit_base": (768, 12, 12),
}


class ViTBlock(nn.Module):
    """Pre-norm ViT block (LN -> MHA -> res, LN -> MLP(GELU) -> res)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, N, C = x.shape
        H = self.num_heads
        h = LayerNorm(name="norm1")(x)
        qkv = nn.Dense(3 * C, kernel_init=torch_linear_init,
                       name="qkv")(h)
        qkv = qkv.reshape(B, N, 3, H, C // H).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jax.nn.softmax(
            (q @ k.transpose(0, 1, 3, 2)) * ((C // H) ** -0.5), axis=-1)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, kernel_init=torch_linear_init, name="proj")(o)
        h = LayerNorm(name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio),
                     kernel_init=torch_linear_init, name="fc1")(h)
        h = nn.Dense(C, kernel_init=torch_linear_init,
                     name="fc2")(nn.gelu(h, approximate=False))
        return x + h


class UiTEncoder(nn.Module):
    """Audio patch-transformer encoder.

    lms [B, T, n_mels] -> patch grid (patch 16x16 over [T, F]) -> ViT
    blocks -> attn_emb [B, T//16, E] (freq-mean per time column),
    fc_emb = masked mean."""
    variant: str = "uit_xs"
    patch: int = 16
    max_frames: int = 992          # 62 time patches at 16-frame patches
    n_mels: int = 64

    @property
    def dims(self) -> Tuple[int, int, int]:
        return UIT_VARIANTS[self.variant]

    @property
    def fc_emb_size(self) -> int:
        return self.dims[0]

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        E, depth, heads = self.dims
        x = BatchNorm(name="bn0")(lms, train=train)
        B, T, F = x.shape
        # pad/crop time to the static patch grid
        if T < self.max_frames:
            x = jnp.pad(x, ((0, 0), (0, self.max_frames - T), (0, 0)))
        else:
            x = x[:, :self.max_frames]
        gt = self.max_frames // self.patch               # time patches
        gf = self.n_mels // self.patch                   # freq patches
        x = nn.Conv(E, (self.patch, self.patch),
                    strides=(self.patch, self.patch), padding="VALID",
                    kernel_init=torch_linear_init,
                    name="patch_embed")(x[..., None])    # [B, gt, gf, E]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, gt * gf, E))
        h = x.reshape(B, gt * gf, E) + pos
        for i in range(depth):
            h = ViTBlock(E, heads, name=f"block{i}")(h)
        h = LayerNorm(name="norm")(h)
        h = h.reshape(B, gt, gf, E)
        attn_emb = jnp.mean(h, axis=2)                   # [B, gt, E]
        out_len = jnp.minimum(feat_len // self.patch, gt)
        fc_emb = mean_with_lens(attn_emb, jnp.maximum(out_len, 1))
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}
