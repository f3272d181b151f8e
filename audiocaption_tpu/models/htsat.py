"""HTS-AT Swin-Transformer audio encoder (TPU re-design of
captioning/models/htsat.py and the Htsat wrapper,
transformer_encoder.py:679-996).

Pipeline: 32 kHz slaney log-mel [B, T<=1024, 64] -> bn0 ->
"wav2img" re-layout into a [B, 256, 256, 1] image (time split into
freq_ratio=4 chunks stacked along frequency, htsat.py:938-955) ->
4 Swin stages (depths 2/2/6/2, heads 4/8/16/32, window 8, shifted
windows with relative position bias, patch merging) -> token grid
[B, 8, 8, 768] -> frequency regrouping + mean -> latent time sequence
[B, 32, 768] (attn_emb) and pooled embedding (fc_emb).

The reference upsamples the 32-step latent back to 10 ms frames by
repetition (htsat.py:890-893); here attn_emb stays at the latent
resolution with attn_emb_len = feat_len // 32 — equivalent content
without the 32x redundancy (a time saver for the decoder's cross
attention).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import (
    BatchNorm, LayerNorm, torch_linear_init)
from audiocaption_tpu.ops.masking import mean_with_lens

Array = jnp.ndarray


def window_partition(x: Array, w: int) -> Array:
    """[B, H, W, C] -> [B*nW, w*w, C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, C)


def window_reverse(windows: Array, w: int, H: int, W: int) -> Array:
    B = windows.shape[0] // (H * W // w // w)
    x = windows.reshape(B, H // w, W // w, w, w, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, -1)


def relative_position_index(w: int) -> np.ndarray:
    """Swin relative position index [w*w, w*w] into the (2w-1)^2 table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))          # [2, w, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # [2, ww, ww]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    """Swin window MHA with relative position bias (htsat.py:296-380)."""
    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        """x: [nW*B, N, C]; mask: [nW, N, N] additive or None."""
        Bn, N, C = x.shape
        H = self.num_heads
        dh = C // H
        qkv = nn.Dense(3 * C, kernel_init=torch_linear_init,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, H, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]                  # [Bn, H, N, dh]
        attn = (q @ k.transpose(0, 1, 3, 2)) * (dh ** -0.5)

        table = self.param("relative_position_bias_table",
                           nn.initializers.normal(0.02),
                           ((2 * self.window - 1) ** 2, H))
        idx = jnp.asarray(relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(N, N, H)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, H, N, N) + \
                mask[None, :, None, :, :]
            attn = attn.reshape(Bn, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, kernel_init=torch_linear_init,
                        name="proj")(out)


def _shift_mask(H: int, W: int, w: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows [nW, w*w, w*w]."""
    img = np.zeros((1, H, W, 1))
    cnt = 0
    slices = (slice(0, -w), slice(-w, -shift), slice(-shift, None))
    for hs in slices:
        for ws in slices:
            img[:, hs, ws, :] = cnt
            cnt += 1
    # pure numpy window_partition: this runs at TRACE time (the mask is
    # a static constant), so no jnp ops are allowed here — under jit
    # they would stage tracers that numpy cannot convert back
    mw = (img.reshape(1, H // w, w, W // w, w, 1)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(-1, w * w))
    mask = mw[:, None, :] - mw[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int],
                 train: bool = False) -> Array:
        H, W = hw
        B, N, C = x.shape
        shortcut = x
        x = LayerNorm(name="norm1")(x).reshape(B, H, W, C)
        if self.shift > 0:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(H, W, self.window, self.shift))
        else:
            mask = None
        windows = window_partition(x, self.window)
        attn = WindowAttention(self.dim, self.window, self.num_heads,
                               name="attn")(windows, mask)
        x = window_reverse(attn, self.window, H, W)
        if self.shift > 0:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + x.reshape(B, N, C)
        h = LayerNorm(name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio),
                     kernel_init=torch_linear_init, name="fc1")(h)
        h = nn.Dense(C, kernel_init=torch_linear_init,
                     name="fc2")(nn.gelu(h, approximate=False))
        return x + h


class PatchMerging(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int]) -> Array:
        H, W = hw
        B, N, C = x.shape
        x = x.reshape(B, H, W, C)
        x = jnp.concatenate([x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                             x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1)
        x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
        x = LayerNorm(name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False,
                        kernel_init=torch_linear_init,
                        name="reduction")(x)


class HtsatEncoder(nn.Module):
    """HTS-AT encoder with the reference's dims; consumes log-mel
    [B, T, 64] (32 kHz, 10 ms hop; T <= spec_size * freq_ratio)."""
    spec_size: int = 256
    patch_stride: int = 4
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window: int = 8
    mlp_ratio: float = 4.0

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // 64

    @property
    def fc_emb_size(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))

    def _wav2img(self, lms: Array) -> Array:
        """[B, T, 64] -> [B, 256, 256, 1] (htsat.py reshape_wav2img)."""
        B, T, F = lms.shape
        target_T = self.spec_size * self.freq_ratio      # 1024
        if T < target_T:
            lms = jax.image.resize(lms, (B, target_T, F), "cubic")
        else:
            lms = lms[:, :target_T]
        x = jnp.transpose(lms, (0, 2, 1))                # [B, F, T']
        fr = self.freq_ratio
        x = x.reshape(B, F, fr, target_T // fr)          # [B, F, 4, 256]
        x = jnp.transpose(x, (0, 2, 1, 3))               # [B, 4, F, 256]
        x = x.reshape(B, fr * F, target_T // fr)         # [B, 256, 256]
        return x[..., None]

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        x = BatchNorm(name="bn0")(lms, train=train)
        x = self._wav2img(x)                             # [B, 256, 256, 1]

        # patch embed: conv 4x4 stride 4 + LN
        p = self.patch_stride
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    kernel_init=torch_linear_init, name="patch_embed")(x)
        H = W = self.spec_size // p                      # 64
        B = x.shape[0]
        x = x.reshape(B, H * W, self.embed_dim)
        x = LayerNorm(name="patch_norm")(x)

        dim = self.embed_dim
        for stage, (depth, heads) in enumerate(zip(self.depths,
                                                   self.num_heads)):
            # Swin rule (htsat.py:410-414): when the resolution is not
            # larger than the window there is a single window — shift
            # is disabled and the window clamps to the resolution.
            window = min(self.window, H, W)
            for blk in range(depth):
                shift = (0 if blk % 2 == 0 or min(H, W) <= self.window
                         else window // 2)
                x = SwinBlock(dim, heads, window, shift,
                              self.mlp_ratio,
                              name=f"stage{stage}_block{blk}")(
                    x, (H, W), train=train)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, name=f"merge{stage}")(x, (H, W))
                H, W = H // 2, W // 2
                dim *= 2
        x = LayerNorm(name="norm")(x)                    # [B, 64, 768]

        # token grid -> frequency regroup -> latent time sequence
        # (htsat.py:880-896): [B, N, C] -> [B, SF=8, ST=8, C]
        SF = ST = self.spec_size // (2 ** (len(self.depths) - 1)) // \
            self.patch_stride                            # 8
        x = x.reshape(B, SF, ST, dim)
        cfb = SF // self.freq_ratio                      # 2
        x = x.reshape(B, SF // cfb, cfb, ST, dim)        # [B, 4, 2, 8, C]
        x = jnp.transpose(x, (0, 2, 1, 3, 4))            # [B, 2, 4, 8, C]
        x = x.reshape(B, cfb, (SF // cfb) * ST, dim)     # [B, 2, 32, C]
        attn_emb = jnp.mean(x, axis=1)                   # [B, 32, C]

        out_len = feat_len // (2 ** (len(self.depths) - 1)) // \
            self.patch_stride
        out_len = jnp.minimum(out_len, attn_emb.shape[1])
        fc_emb = mean_with_lens(attn_emb, jnp.maximum(out_len, 1))
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": out_len}


def convert_htsat(sd, prefix: str = "") -> Tuple[Dict, Dict]:
    """torch HTSAT_Swin_Transformer state_dict -> (params, batch_stats).

    torch names: bn0, patch_embed.proj/norm, layers.{s}.blocks.{b}.
    {norm1,attn.{qkv,proj,relative_position_bias_table},norm2,
    mlp.{fc1,fc2}}, layers.{s}.downsample.{reduction,norm}, norm."""
    k = lambda n: f"{prefix}.{n}" if prefix else n
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    bn_p, bn_s = convert.batchnorm(sd, k("bn0"))
    params["bn0"], stats["bn0"] = bn_p, bn_s
    params["patch_embed"] = convert.conv2d(sd, k("patch_embed.proj"),
                                           bias=True)
    params["patch_embed"]["bias"] = sd[k("patch_embed.proj.bias")]
    params["patch_norm"] = convert.layernorm(sd, k("patch_embed.norm"))
    depths = (2, 2, 6, 2)
    for s, depth in enumerate(depths):
        for b in range(depth):
            tp = k(f"layers.{s}.blocks.{b}")
            params[f"stage{s}_block{b}"] = {
                "norm1": convert.layernorm(sd, f"{tp}.norm1"),
                "norm2": convert.layernorm(sd, f"{tp}.norm2"),
                "attn": {
                    "qkv": convert.linear(sd, f"{tp}.attn.qkv"),
                    "proj": convert.linear(sd, f"{tp}.attn.proj"),
                    "relative_position_bias_table":
                        sd[f"{tp}.attn.relative_position_bias_table"],
                },
                "fc1": convert.linear(sd, f"{tp}.mlp.fc1"),
                "fc2": convert.linear(sd, f"{tp}.mlp.fc2"),
            }
        if s < len(depths) - 1:
            tp = k(f"layers.{s}.downsample")
            params[f"merge{s}"] = {
                "norm": convert.layernorm(sd, f"{tp}.norm"),
                "reduction": convert.linear(sd, f"{tp}.reduction",
                                            bias=False),
            }
    params["norm"] = convert.layernorm(sd, k("norm"))
    return params, stats
