"""UIT audio transformers — faithful TPU rebuild of the reference's
uit.py model family (captioning/models/uit.py:253-660).

The reference uit.py is a standalone AudioSet tagger family (nothing in
the reference imports it; its checkpoints live on zenodo,
uit.py:643-660).  This rebuild reproduces:

  * ``UITBase``: 16 kHz log-mel frontend (n_fft 512, hop 160, 64 mels,
    f_max 8000, AmplitudeToDB 120, uit.py:297-310) -> per-mel-bin
    BatchNorm (init_bn, :312-317) -> 16x16/16 conv patch embed
    (:45-77,319-325) -> separable freq/time positional embeddings +
    optional cls token (:330-336) -> pre-norm transformer blocks
    (:208-249) -> LayerNorm -> (LayerNorm + Linear) head with sigmoid,
    pooled by 'token' | 'mean' | 'dm' (:399-413);
  * ``BNeckAttention`` (:92-124): qkv projects to a dim//4 bottleneck
    split over heads, but the softmax scale is (dim/num_heads)^-0.5 —
    computed from the FULL dim, a reference quirk that checkpoint parity
    must replicate;
  * plain ``Attention`` (:126-181), scale (dim/num_heads)^-0.5 over the
    real head dim;
  * the published variants uit_xs / uit_xxs / uit_xxxs (:584-640: embed
    128, heads 2, mlp 3.0, ReLU, BNeckAttention, depth 12/6/4) and the
    audio_transformer_h128_* family;
  * eval-time chunking over ``target_length`` windows with mean/max
    averaging (:468-492);
  * checkpoint conversion incl. the reference's positional-embedding
    resize-on-load (slice or bilinear, :425-450).

(`BNeckAttentionV2`, named by one variant constructor, does not exist in
the reference file — that variant is dead code and is not reproduced.)

``UitEncoder`` additionally adapts a UIT trunk to the captioning
encoder contract {fc_emb, attn_emb, attn_emb_len} (our wiring; the
reference never connected uit.py to captioning).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import BatchNorm, torch_linear_init
from audiocaption_tpu.ops.frontend import LogMelFrontend, MelConfig
from audiocaption_tpu.ops.masking import length_mask, mean_with_lens

Array = jnp.ndarray

# uit.py:297-310 frontend settings (16 kHz, n_fft 512 = 32 ms,
# hop 160 = 10 ms, f_min 0, f_max 8000, AmplitudeToDB top_db 120)
UIT_MEL_16K = MelConfig(sample_rate=16000, f_min=0.0, f_max=8000.0,
                        norm=None, mel_scale="htk", top_db=120.0)


class BNeckAttention(nn.Module):
    """Bottleneck attention (uit.py:92-124): qkv -> dim//4, softmax
    scale from the FULL per-head dim (reference quirk)."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inner = self.dim // 4
        scale = (self.dim // self.num_heads) ** -0.5   # quirk: full dim
        qkv = nn.Dense(inner * 3, use_bias=self.qkv_bias,
                       kernel_init=torch_linear_init, name="qkv")(x)
        B, N, _ = x.shape
        dh = inner // self.num_heads
        qkv = qkv.reshape(B, N, 3, self.num_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, inner)
        return nn.Dense(self.dim, kernel_init=torch_linear_init,
                        name="proj")(out)


class Attention(nn.Module):
    """Standard ViT attention (uit.py:126-181)."""
    dim: int
    num_heads: int = 8
    qkv_bias: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dh = self.dim // self.num_heads
        scale = dh ** -0.5
        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                       kernel_init=torch_linear_init, name="qkv")(x)
        B, N, _ = x.shape
        qkv = qkv.reshape(B, N, 3, self.num_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        if self.causal:
            mask = jnp.triu(jnp.ones((N, N), bool), 1)
            attn = jnp.where(mask, jnp.finfo(attn.dtype).min, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N,
                                                             self.dim)
        return nn.Dense(self.dim, kernel_init=torch_linear_init,
                        name="proj")(out)


class Block(nn.Module):
    """Pre-norm transformer block (uit.py:208-249); LayerScale when
    init_values is set, DropPath omitted (all published variants use
    drop_path_rate 0)."""
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    init_values: Optional[float] = None
    act: str = "gelu"
    attention_type: str = "Attention"

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        attn_cls = (BNeckAttention if self.attention_type == "BNeckAttention"
                    else Attention)
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = attn_cls(dim=self.dim, num_heads=self.num_heads,
                     qkv_bias=self.qkv_bias, name="attn")(h, train=train)
        if self.init_values:
            h = h * self.param("ls1_gamma",
                               nn.initializers.constant(self.init_values),
                               (self.dim,))
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        act = nn.relu if self.act == "relu" else nn.gelu
        h = nn.Dense(int(self.dim * self.mlp_ratio),
                     kernel_init=torch_linear_init, name="mlp_fc1")(h)
        h = act(h)
        h = nn.Dense(self.dim, kernel_init=torch_linear_init,
                     name="mlp_fc2")(h)
        if self.init_values:
            h = h * self.param("ls2_gamma",
                               nn.initializers.constant(self.init_values),
                               (self.dim,))
        return x + h


class UITBase(nn.Module):
    """Reference UITBase (uit.py:253-492)."""
    outputdim: int = 527
    patch_size: int = 16
    patch_stride: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = None
    target_length: int = 1012
    pooling: str = "mean"              # 'mean' | 'token' | 'dm'
    n_mels: int = 64
    act: str = "gelu"
    attention_type: str = "Attention"
    eval_avg: str = "mean"
    mel: MelConfig = UIT_MEL_16K

    @property
    def grid_f(self) -> int:
        return self.n_mels // self.patch_stride

    @property
    def grid_t(self) -> int:
        return self.target_length // self.patch_stride

    def setup(self):
        self.frontend = LogMelFrontend(self.mel)
        self.init_bn = BatchNorm(momentum=0.99, name="init_bn")
        self.patch_proj = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_stride, self.patch_stride),
            padding="VALID", name="patch_proj")
        # positional params kept in the reference's torch layouts so
        # conversion is shape-identical (uit.py:330-336)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6),
            (1, 1, self.embed_dim))
        self.token_pos_embed = self.param(
            "token_pos_embed", nn.initializers.normal(0.02),
            (1, self.embed_dim))
        self.time_pos_embed = self.param(
            "time_pos_embed", nn.initializers.normal(0.02),
            (1, self.embed_dim, 1, self.grid_t))
        self.freq_pos_embed = self.param(
            "freq_pos_embed", nn.initializers.normal(0.02),
            (1, self.embed_dim, self.grid_f, 1))
        self.blocks = [Block(dim=self.embed_dim, num_heads=self.num_heads,
                             mlp_ratio=self.mlp_ratio,
                             qkv_bias=self.qkv_bias,
                             init_values=self.init_values, act=self.act,
                             attention_type=self.attention_type,
                             name=f"blocks_{i}")
                       for i in range(self.depth)]
        self.norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        self.out_norm = nn.LayerNorm(name="out_norm")
        self.out_proj = nn.Dense(self.outputdim,
                                 kernel_init=torch_linear_init,
                                 name="out_proj")

    # ----------------------------------------------------------- pieces --

    def normed_spectrogram(self, lms: Array, train: bool = False) -> Array:
        """log-mel [B, T, M] -> init_bn-normalized image [B, F, T, 1]."""
        x = self.init_bn(lms, train=train)                # BN over mels
        return jnp.transpose(x, (0, 2, 1))[..., None]     # [B, F, T, 1]

    def forward_features(self, img: Array, train: bool = False) -> Array:
        """[B, F, T, 1] -> tokens [B, (f t)(+1), E] (uit.py:522-541)."""
        x = self.patch_proj(img)                          # [B, f, t, E]
        t = x.shape[2]
        tpe = jnp.transpose(self.time_pos_embed, (0, 2, 3, 1))  # [1,1,T,E]
        fpe = jnp.transpose(self.freq_pos_embed, (0, 2, 3, 1))  # [1,F,1,E]
        x = x + tpe[:, :, :t] + fpe
        B, f, t, E = x.shape
        x = x.reshape(B, f * t, E)                        # b (f t) c
        if self.pooling == "token":
            cls = jnp.broadcast_to(self.cls_token + self.token_pos_embed,
                                   (B, 1, E))
            x = jnp.concatenate([cls, x], axis=1)
        for blk in self.blocks:
            x = blk(x, train=train)
        return self.norm(x)

    def forward_head(self, x: Array) -> Array:
        """(uit.py:399-413)."""
        if self.pooling == "token":
            pooled = x[:, 0]
        elif self.pooling == "mean":
            pooled = jnp.mean(x, axis=1)
        else:                                             # 'dm'
            B, N, E = x.shape
            x = x.reshape(B, self.grid_f, N // self.grid_f, E)
            return jnp.mean(jax.nn.sigmoid(
                self.out_proj(self.out_norm(jnp.mean(x, axis=1)))), axis=1)
        return jax.nn.sigmoid(self.out_proj(self.out_norm(pooled)))

    # ---------------------------------------------------------- forward --

    def __call__(self, wav: Array, train: bool = False) -> Array:
        """Waveform [B, T] -> class probabilities [B, outputdim], with
        eval-time chunking over target_length windows (uit.py:468-492)."""
        lms = self.frontend(wav)                          # [B, T, M]
        img = self.normed_spectrogram(lms, train=train)
        T = img.shape[2]
        if train or T <= self.target_length:
            return self.forward_head(self.forward_features(
                img[:, :, :min(T, self.target_length)], train=train))
        outs = []
        for s in range(0, T, self.target_length):
            chunk = img[:, :, s:s + self.target_length]
            if chunk.shape[2] != self.target_length:      # crop last step
                chunk = img[:, :, T - self.target_length:]
            outs.append(self.forward_head(self.forward_features(chunk)))
        stacked = jnp.stack(outs, axis=-1)
        if self.eval_avg == "mean":
            return jnp.mean(stacked, axis=-1)
        if self.eval_avg == "max":
            return jnp.max(stacked, axis=-1)
        raise ValueError(self.eval_avg)


# --------------------------------------------------------------------------
# Published variants (uit.py:497-640)
# --------------------------------------------------------------------------

def _variant(**kw):
    def make(**overrides):
        args = dict(kw)
        args.update(overrides)
        return UITBase(**args)
    return make


uit_xs = _variant(patch_size=16, embed_dim=128, depth=12, num_heads=2,
                  mlp_ratio=3.0, pooling="mean", act="relu",
                  attention_type="BNeckAttention")
uit_xxs = _variant(patch_size=16, embed_dim=128, depth=6, num_heads=2,
                   mlp_ratio=3.0, pooling="mean", act="relu",
                   attention_type="BNeckAttention")
uit_xxxs = _variant(patch_size=16, embed_dim=128, depth=4, num_heads=2,
                    mlp_ratio=3.0, pooling="mean", act="relu",
                    attention_type="BNeckAttention")
audio_transformer_h128_d4_m3 = _variant(
    patch_size=16, embed_dim=128, depth=4, num_heads=2, mlp_ratio=3.0,
    pooling="mean")
audio_transformer_h128_d4_m3_relu = _variant(
    patch_size=16, embed_dim=128, depth=4, num_heads=2, mlp_ratio=3.0,
    pooling="mean", act="relu")
audio_transformer_h128_d6_m3 = _variant(
    patch_size=16, embed_dim=128, depth=6, num_heads=2, mlp_ratio=3.0,
    pooling="mean")

UIT_VARIANTS = {
    "uit_xs": uit_xs, "uit_xxs": uit_xxs, "uit_xxxs": uit_xxxs,
    "audio_transformer_h128_d4_m3": audio_transformer_h128_d4_m3,
    "audio_transformer_h128_d4_m3_relu": audio_transformer_h128_d4_m3_relu,
    "audio_transformer_h128_d6_m3": audio_transformer_h128_d6_m3,
}

# zenodo checkpoints use outputdim 537, target_length 102 (uit.py:643-660)
UIT_PRETRAINED_KWARGS = {"outputdim": 537, "target_length": 102}


# --------------------------------------------------------------------------
# Checkpoint conversion
# --------------------------------------------------------------------------

def _resize_pos_embed(pe: np.ndarray, target: int, axis: int) -> np.ndarray:
    """Reference change_pos_embedding (uit.py:425-450): slice when the
    target is shorter, bilinear interpolate when longer."""
    cur = pe.shape[axis]
    if target == cur:
        return pe
    if target < cur:
        sl = [slice(None)] * pe.ndim
        sl[axis] = slice(0, target)
        return pe[tuple(sl)]
    shape = list(pe.shape)
    shape[axis] = target
    return np.asarray(jax.image.resize(jnp.asarray(pe), shape,
                                       method="bilinear"))


def convert_uit(sd: Dict[str, np.ndarray], model: Optional[UITBase] = None,
                prefix: str = "") -> Tuple[Dict, Dict]:
    """torch UITBase state_dict -> (params, batch_stats).  When a target
    ``model`` is given its grid sizes drive the reference's
    pos-embedding resize-on-load; without it the tables are converted
    as-is (the trainer's shape-checked merge then skips mismatches)."""
    k = lambda name: f"{prefix}.{name}" if prefix else name
    bn_p, bn_s = convert.batchnorm(sd, k("init_bn.1"))
    tpe = sd[k("time_pos_embed")]
    fpe = sd[k("freq_pos_embed")]
    if model is not None:
        tpe = _resize_pos_embed(tpe, model.grid_t, 3)
        fpe = _resize_pos_embed(fpe, model.grid_f, 2)
    params: Dict[str, Any] = {
        "init_bn": bn_p,
        "patch_proj": convert.conv2d(sd, k("patch_embed.proj"), bias=True),
        "cls_token": sd[k("cls_token")],
        "token_pos_embed": sd[k("token_pos_embed")],
        "time_pos_embed": tpe,
        "freq_pos_embed": fpe,
        "norm": convert.layernorm(sd, k("norm")),
        "out_norm": convert.layernorm(sd, k("outputlayer.0")),
        "out_proj": convert.linear(sd, k("outputlayer.1")),
    }
    bkey = k("blocks.")
    depth = (model.depth if model is not None else
             1 + max(int(key[len(bkey):].split(".")[0]) for key in sd
                     if key.startswith(bkey)))
    for i in range(depth):
        b = f"blocks.{i}"
        blk = {
            "norm1": convert.layernorm(sd, k(f"{b}.norm1")),
            "norm2": convert.layernorm(sd, k(f"{b}.norm2")),
            "attn": {
                "qkv": convert.linear(sd, k(f"{b}.attn.qkv")),
                "proj": convert.linear(sd, k(f"{b}.attn.proj")),
            },
            "mlp_fc1": convert.linear(sd, k(f"{b}.mlp.fc1")),
            "mlp_fc2": convert.linear(sd, k(f"{b}.mlp.fc2")),
        }
        if k(f"{b}.ls1.gamma") in sd:
            blk["ls1_gamma"] = sd[k(f"{b}.ls1.gamma")]
            blk["ls2_gamma"] = sd[k(f"{b}.ls2.gamma")]
        params[f"blocks_{i}"] = blk
    stats = {"init_bn": bn_s}
    return params, stats


# --------------------------------------------------------------------------
# Captioning-encoder adapter
# --------------------------------------------------------------------------

class UitEncoder(nn.Module):
    """UIT trunk -> captioning encoder contract: per-time-patch tokens
    (freq patches mean-pooled) as attn_emb, masked mean as fc_emb."""
    trunk: UITBase

    @nn.compact
    def __call__(self, lms: Array, feat_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        img = self.trunk.normed_spectrogram(lms, train=train)
        img = img[:, :, :self.trunk.target_length]
        tokens = self.trunk.forward_features(img, train=train)
        if self.trunk.pooling == "token":
            tokens = tokens[:, 1:]
        B, N, E = tokens.shape
        gf = self.trunk.grid_f
        attn_emb = jnp.mean(tokens.reshape(B, gf, N // gf, E), axis=1)
        attn_emb_len = jnp.minimum(feat_len // self.trunk.patch_stride,
                                   attn_emb.shape[1])
        attn_emb_len = jnp.maximum(attn_emb_len, 1)
        fc_emb = mean_with_lens(attn_emb, attn_emb_len)
        return {"fc_emb": fc_emb, "attn_emb": attn_emb,
                "attn_emb_len": attn_emb_len}
