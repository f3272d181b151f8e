"""Neural building blocks with PyTorch-compatible semantics.

These are flax.linen modules laid out for TPU (NHWC convs, matmul-major
GRU, fused attention) but numerically equivalent to the torch layers the
reference composes, so converted checkpoints reproduce reference outputs
token-for-token.  Parity notes per layer cite the torch op they mirror.

Precision policy: parameters and normalization statistics stay float32;
``compute_dtype`` (optionally bfloat16) applies to conv/matmul inputs so
the MXU runs at full rate while accumulating in float32.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
Dtype = Any


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    shape is the flax kernel shape [in, out].
    """
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class BatchNorm(nn.Module):
    """BatchNorm over the last axis with torch semantics.

    torch BatchNorm2d(momentum=0.1) == flax momentum 0.9; eps defaults to
    torch's 1e-5.  Statistics always kept in float32.  Input may be any
    rank; normalization is per-feature over all other axes.
    """
    momentum: float = 0.9
    epsilon: float = 1e-5
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))

        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            n = np.prod([x.shape[a] for a in axes])
            # torch tracks *unbiased* variance in running stats
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.compute_dtype)


# Trace-time switch for the depthwise-conv kernel-grad implementation.
# The stock grouped-conv kernel grad lowers to a batch_group_count conv
# that XLA's SPMD partitioner multiplies by the size of any unrelated
# mesh axis (measured exactly 2x with a ('data','model') model=2 mesh) —
# but the GSPMD-safe tap-sum backward is much slower on TPU for big
# programs.  Default: stock (fast, correct on <=1-axis meshes).  The
# tensor-parallel entry points (parallel/tp.py, make_train_step with a
# 'model' mesh axis) flip this BEFORE tracing their step.
_DEPTHWISE_SAFE_GRAD = False


def set_depthwise_safe_grad(on: bool) -> None:
    """Select the GSPMD-safe depthwise kernel-grad (see above).  Takes
    effect at TRACE time — call before jitting a multi-axis-mesh step."""
    global _DEPTHWISE_SAFE_GRAD
    _DEPTHWISE_SAFE_GRAD = bool(on)


@contextlib.contextmanager
def depthwise_safe_grad(on: bool = True):
    """Scope the safe-grad flag to a trace: the TP train step wraps its
    body in this so single-device/1-D-mesh steps traced later in the
    same process keep the fast stock grouped-conv backward."""
    global _DEPTHWISE_SAFE_GRAD
    prev = _DEPTHWISE_SAFE_GRAD
    _DEPTHWISE_SAFE_GRAD = bool(on)
    try:
        yield
    finally:
        _DEPTHWISE_SAFE_GRAD = prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _depthwise_conv(x_pad: Array, kernel: Array,
                    strides: Tuple[int, int]) -> Array:
    """Depthwise conv on a pre-padded NHWC input, with a GSPMD-safe
    kernel gradient.

    The custom backward computes dk as kh*kw shifted elementwise
    products (no grouped-conv-grad primitive, so the SPMD partitioner
    cannot double it).
    """
    return jax.lax.conv_general_dilated(
        x_pad, kernel, window_strides=strides, padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x_pad.shape[-1])


def _depthwise_conv_fwd(x_pad, kernel, strides):
    return _depthwise_conv(x_pad, kernel, strides), (x_pad, kernel)


def _depthwise_conv_bwd(strides, res, dy):
    x_pad, kernel = res
    # input grad via the standard rule (lowers to a plain grouped conv,
    # which the partitioner handles correctly)
    _, pullback = jax.vjp(
        lambda xx: jax.lax.conv_general_dilated(
            xx, kernel, window_strides=strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=x_pad.shape[-1]), x_pad)
    dx, = pullback(dy)
    kh, kw, _, C = kernel.shape
    s0, s1 = strides
    B, OH, OW, _ = dy.shape
    # kernel grad as kh*kw shifted products against the cotangent
    # DILATED back to the stride-1 grid.  Unit-stride slices only:
    # strided lax.slice taps measured MISCOMPILED (NaN) inside the
    # fused EffB2 backward on TPU, while this layout is clean.
    dy32 = dy.astype(jnp.float32)
    if s0 > 1 or s1 > 1:
        d = dy32[:, :, None, :, None, :]               # [B,OH,1,OW,1,C]
        d = jnp.pad(d, ((0, 0), (0, 0), (0, s0 - 1),
                        (0, 0), (0, s1 - 1), (0, 0)))
        d = d.reshape(B, OH * s0, OW * s1, C)
        dy_dil = d[:, :(OH - 1) * s0 + 1, :(OW - 1) * s1 + 1, :]
    else:
        dy_dil = dy32
    DH, DW = dy_dil.shape[1], dy_dil.shape[2]
    taps = []
    for i in range(kh):
        for j in range(kw):
            xs = jax.lax.slice(x_pad, (0, i, j, 0), (B, i + DH, j + DW, C))
            taps.append(jnp.sum(xs.astype(jnp.float32) * dy_dil,
                                axis=(0, 1, 2)))
    dk = jnp.stack(taps).reshape(kh, kw, 1, C).astype(kernel.dtype)
    return dx, dk


_depthwise_conv.defvjp(_depthwise_conv_fwd, _depthwise_conv_bwd)


class Conv2dSame(nn.Module):
    """Conv with explicit padding; weights stored flax-style [kh,kw,I,O].

    ``padding`` uses torch Conv2d conventions: an int or (ph, pw) pair
    means symmetric zero padding; a 4-tuple (top, bottom, left, right)
    expresses TF-style asymmetric SAME padding (EfficientNet).
    """
    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0
    use_bias: bool = False
    groups: int = 1
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        p = self.padding
        if isinstance(p, int):
            pad = ((p, p), (p, p))
        elif len(p) == 2:
            pad = ((p[0], p[0]), (p[1], p[1]))
        else:
            pad = ((p[0], p[1]), (p[2], p[3]))
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            (kh, kw, x.shape[-1] // self.groups, self.features), jnp.float32)
        # no preferred_element_type=f32 here: with bf16 operands the
        # conv GRAD rule feeds the f32 cotangent back into a bf16 conv
        # and lax raises a dtype mismatch — bf16 training would break.
        # The f32 accumulation was rounded to compute_dtype on return
        # anyway (and the TPU MXU accumulates f32 internally regardless).
        if (self.groups > 1 and self.groups == x.shape[-1]
                and _DEPTHWISE_SAFE_GRAD):
            # depthwise under a multi-axis mesh: custom vjp (see
            # _depthwise_conv — the stock grouped-conv kernel-grad is
            # doubled by the SPMD partitioner there)
            x_pad = jnp.pad(x.astype(self.compute_dtype),
                            ((0, 0), pad[0], pad[1], (0, 0)))
            y = _depthwise_conv(x_pad,
                                kernel.astype(self.compute_dtype),
                                self.strides)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.compute_dtype),
                kernel.astype(self.compute_dtype),
                window_strides=self.strides,
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.groups,
            )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.compute_dtype)


def avg_pool(x: Array, window: Tuple[int, int]) -> Array:
    """Non-overlapping average pool on NHWC (torch F.avg_pool2d)."""
    if window == (1, 1):
        return x
    return nn.avg_pool(x, window, strides=window)


def max_pool(x: Array, window: Tuple[int, int]) -> Array:
    if window == (1, 1):
        return x
    return nn.max_pool(x, window, strides=window)


class ConvBlock(nn.Module):
    """PANNs double-conv block (reference cnn_encoder.py:32-77).

    conv3x3(pad 1, no bias) -> BN -> relu, twice; pooling applied by the
    caller (pool type varies per call site).
    """
    features: int
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        x = Conv2dSame(self.features, (3, 3), padding=1, compute_dtype=cd,
                       name="conv1")(x)
        x = BatchNorm(compute_dtype=cd, name="bn1")(x, train=train)
        x = nn.relu(x)
        x = Conv2dSame(self.features, (3, 3), padding=1, compute_dtype=cd,
                       name="conv2")(x)
        x = BatchNorm(compute_dtype=cd, name="bn2")(x, train=train)
        x = nn.relu(x)
        return x


def pool_2d(x: Array, window: Tuple[int, int], pool_type: str) -> Array:
    """avg / max / avg+max pooling (reference ConvBlock.forward)."""
    if pool_type == "avg":
        return avg_pool(x, window)
    if pool_type == "max":
        return max_pool(x, window)
    if pool_type == "avg+max":
        return avg_pool(x, window) + max_pool(x, window)
    raise ValueError(pool_type)


# --------------------------------------------------------------------------
# GRU
# --------------------------------------------------------------------------

class GRUCellParams(nn.Module):
    """Parameter container for one torch-convention GRU direction.

    Gate order r, z, n packed along the last axis (torch weight_ih_l{k}
    layout transposed to [in, 3H] for right-multiplication).
    """
    hidden_size: int

    @nn.compact
    def __call__(self, x_proj: Array, h: Array) -> Array:
        """One step. x_proj: [B, 3H] (precomputed x @ w_ih + b_ih)."""
        H = self.hidden_size
        w_hh = self.param("w_hh", torch_linear_init, (H, 3 * H))
        b_hh = self.param("b_hh", torch_linear_init, (3 * H,), )
        h_proj = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(x_proj, 3, axis=-1)
        hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h


def _gru_scan(x_proj: Array, mask: Array, h0: Array,
              cell: Callable[[Array, Array], Array],
              reverse: bool = False) -> Tuple[Array, Array]:
    """Scan a GRU direction over time with state freezing on padding.

    x_proj: [B, T, 3H] precomputed input projections; mask: [B, T] bool.
    Returns (outputs [B, T, H] zeroed on padding, final_h [B, H]).
    With ``reverse`` the scan runs T-1..0 — combined with per-row
    length-reversal by the caller this reproduces torch pack_padded
    semantics for bidirectional RNNs.
    """
    def step(h, inp):
        xp, m = inp
        h_new = cell(xp, h)
        h = jnp.where(m[:, None], h_new, h)
        out = jnp.where(m[:, None], h, jnp.zeros_like(h))
        return h, out

    xs = (jnp.swapaxes(x_proj, 0, 1), jnp.swapaxes(mask, 0, 1))
    final_h, outs = jax.lax.scan(step, h0, xs, reverse=reverse)
    return jnp.swapaxes(outs, 0, 1), final_h


def reverse_by_length(x: Array, lens: Array) -> Array:
    """Per-row reversal of the valid prefix: out[b, t] = x[b, len_b-1-t]
    for t < len_b, 0 after.  Used to run the backward GRU direction with
    torch pack_padded semantics."""
    B, T = x.shape[0], x.shape[1]
    t_idx = jnp.arange(T)[None, :]
    src = lens[:, None] - 1 - t_idx
    valid = src >= 0
    src = jnp.clip(src, 0, T - 1)
    out = jnp.take_along_axis(
        x, src.reshape(src.shape + (1,) * (x.ndim - 2)), axis=1)
    mask = valid.reshape(valid.shape + (1,) * (x.ndim - 2))
    return jnp.where(mask, out, jnp.zeros_like(out))


class GRU(nn.Module):
    """Multi-layer (bi)directional GRU, torch nn.GRU semantics with
    pack_padded_sequence behavior expressed through length masks
    (replaces the reference's pack_wrapper, model_util.py:22-27).

    The input projection for a whole sequence is one big matmul (MXU),
    the scan carries only the [B, H] recurrent matmul.
    """
    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    dropout: float = 0.0
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, lens: Array, train: bool = False,
                 h0: Optional[Array] = None
                 ) -> Tuple[Array, Array]:
        """x: [B, T, I]; lens: [B] -> (out [B, T, H*D], h_n [L*D, B, H])."""
        from audiocaption_tpu.ops.masking import length_mask
        B, T = x.shape[0], x.shape[1]
        H = self.hidden_size
        mask = length_mask(lens, T)
        num_dir = 2 if self.bidirectional else 1
        if h0 is None:
            h0 = jnp.zeros((self.num_layers * num_dir, B, H), x.dtype)

        finals = []
        for layer in range(self.num_layers):
            dir_outs = []
            for d in range(num_dir):
                suffix = f"l{layer}" + ("_reverse" if d == 1 else "")
                w_ih = self.param(f"w_ih_{suffix}", torch_linear_init,
                                  (x.shape[-1], 3 * H))
                b_ih = self.param(f"b_ih_{suffix}", torch_linear_init, (3 * H,))
                cell = GRUCellParams(H, name=f"cell_{suffix}")
                xin = reverse_by_length(x, lens) if d == 1 else x
                x_proj = xin @ w_ih + b_ih
                h_init = h0[layer * num_dir + d]
                # materialize cell params outside the scan (flax cannot
                # create params inside lax.scan bodies); DCE removes it
                cell(x_proj[:, 0], h_init)
                outs, h_n = _gru_scan(x_proj, mask, h_init,
                                      lambda xp, h, c=cell: c(xp, h))
                if d == 1:
                    outs = reverse_by_length(outs, lens)
                dir_outs.append(outs)
                finals.append(h_n)
            x = jnp.concatenate(dir_outs, axis=-1) if num_dir == 2 else dir_outs[0]
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x, jnp.stack(finals)


class GRUCellStack(nn.Module):
    """Single-step multi-layer unidirectional GRU for decoding
    (torch nn.GRU called with T=1, as the RNN decoders do)."""
    hidden_size: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x: Array, h: Array) -> Tuple[Array, Array]:
        """x: [B, I], h: [L, B, H] -> (out [B, H], new h [L, B, H])."""
        H = self.hidden_size
        new_h = []
        for layer in range(self.num_layers):
            w_ih = self.param(f"w_ih_l{layer}", torch_linear_init,
                              (x.shape[-1], 3 * H))
            b_ih = self.param(f"b_ih_l{layer}", torch_linear_init, (3 * H,))
            cell = GRUCellParams(H, name=f"cell_l{layer}")
            x = cell(x @ w_ih + b_ih, h[layer])
            new_h.append(x)
        return x, jnp.stack(new_h)


# --------------------------------------------------------------------------
# Attention / Transformer
# --------------------------------------------------------------------------

def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal table matching the reference PositionalEncoding
    (model_util.py:167-186): sin on even dims, cos on odd."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * (-math.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention semantics (scaled dot-product; torch's
    packed in_proj_weight is split into q/k/v kernels by the converter).

    Two call paths share one parameter set:
      * ``__call__`` — full-sequence attention (training / seq_forward);
      * ``project_kv`` + ``attend_step`` — KV-cached single-token decode.
        The reference re-encodes the whole prefix every step
        (transformer_model.py:59-86); the cache removes that O(L^2) cost.
    """
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    compute_dtype: Dtype = jnp.float32

    def setup(self):
        dense = lambda name: nn.Dense(self.embed_dim,
                                      kernel_init=torch_linear_init,
                                      name=name, dtype=self.compute_dtype,
                                      param_dtype=jnp.float32)
        self.q_proj = dense("q_proj")
        self.k_proj = dense("k_proj")
        self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.attn_dropout = nn.Dropout(self.dropout)

    def _attend(self, q: Array, k: Array, v: Array,
                key_padding_mask: Optional[Array],
                attn_mask: Optional[Array],
                train: bool) -> Array:
        E, H = self.embed_dim, self.num_heads
        Dh = E // H
        B, Tq, Tk = q.shape[0], q.shape[1], k.shape[1]
        q = q.reshape(B, Tq, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Tk, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Tk, H, Dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(Dh)
        if attn_mask is not None:
            scores = scores + attn_mask[None, None, :, :]
        if key_padding_mask is not None:
            big_neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
            scores = jnp.where(key_padding_mask[:, None, None, :], big_neg,
                               scores)
        probs = jax.nn.softmax(scores, axis=-1)
        if train and self.dropout > 0:
            probs = self.attn_dropout(probs, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd",
                         probs.astype(self.compute_dtype),
                         v.astype(self.compute_dtype),
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, E)
        return self.out_proj(out.astype(self.compute_dtype))

    def __call__(self,
                 query: Array,             # [B, Tq, E]
                 key: Array,               # [B, Tk, E]
                 value: Array,             # [B, Tk, E]
                 key_padding_mask: Optional[Array] = None,  # [B, Tk] True=pad
                 attn_mask: Optional[Array] = None,         # [Tq, Tk] additive
                 train: bool = False) -> Array:
        q = self.q_proj(query)
        k = self.k_proj(key)
        v = self.v_proj(value)
        return self._attend(q, k, v, key_padding_mask, attn_mask, train)

    def project_kv(self, key: Array, value: Array) -> Tuple[Array, Array]:
        """Precompute projected K/V (for cross-attn memory or to fill a
        self-attn cache)."""
        return self.k_proj(key), self.v_proj(value)

    def attend_step(self, q_t: Array, k: Array, v: Array,
                    key_padding_mask: Optional[Array],
                    train: bool = False) -> Array:
        """Single-token attention over cached K/V.

        q_t: [B, E]; k/v: [B, S, E]; key_padding_mask: [B, S] True=masked.
        """
        q = self.q_proj(q_t[:, None, :])
        out = self._attend(q, k, v, key_padding_mask, None, train)
        return out[:, 0, :]


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps 1e-5), float32 math."""
    epsilon: float = 1e-5
    compute_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon) * scale + bias
        return y.astype(self.compute_dtype)


class TransformerDecoderLayer(nn.Module):
    """torch nn.TransformerDecoderLayer (post-norm, relu) semantics:
    self-attn -> add&norm -> cross-attn -> add&norm -> FFN -> add&norm.

    ``step`` is the KV-cached single-token decode path; it shares all
    parameters with ``__call__``.
    """
    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    compute_dtype: Dtype = jnp.float32

    def setup(self):
        cd = self.compute_dtype
        self.self_attn = MultiheadAttention(self.d_model, self.num_heads,
                                            self.dropout, cd, name="self_attn")
        self.cross_attn = MultiheadAttention(self.d_model, self.num_heads,
                                             self.dropout, cd,
                                             name="cross_attn")
        self.norm1 = LayerNorm(compute_dtype=cd, name="norm1")
        self.norm2 = LayerNorm(compute_dtype=cd, name="norm2")
        self.norm3 = LayerNorm(compute_dtype=cd, name="norm3")
        self.linear1 = nn.Dense(self.dim_feedforward,
                                kernel_init=torch_linear_init, dtype=cd,
                                param_dtype=jnp.float32, name="linear1")
        self.linear2 = nn.Dense(self.d_model, kernel_init=torch_linear_init,
                                dtype=cd, param_dtype=jnp.float32,
                                name="linear2")
        self.dropout_layer = nn.Dropout(self.dropout)

    def _ffn(self, x: Array, drop) -> Array:
        h = drop(nn.relu(self.linear1(x)))
        return self.linear2(h)

    def __call__(self, x: Array, memory: Array,
                 tgt_mask: Optional[Array] = None,
                 tgt_key_padding_mask: Optional[Array] = None,
                 memory_key_padding_mask: Optional[Array] = None,
                 train: bool = False) -> Array:
        drop = lambda y: (self.dropout_layer(y, deterministic=False)
                          if train and self.dropout > 0 else y)
        sa = self.self_attn(x, x, x, key_padding_mask=tgt_key_padding_mask,
                            attn_mask=tgt_mask, train=train)
        x = self.norm1(x + drop(sa))
        ca = self.cross_attn(x, memory, memory,
                             key_padding_mask=memory_key_padding_mask,
                             train=train)
        x = self.norm2(x + drop(ca))
        x = self.norm3(x + drop(self._ffn(x, drop)))
        return x

    def precompute_memory(self, memory: Array) -> Tuple[Array, Array]:
        """Project cross-attention K/V once per decoded sequence."""
        return self.cross_attn.project_kv(memory, memory)

    def step(self, x_t: Array, t: Array,
             self_k: Array, self_v: Array,        # [B, L_max, E] caches
             self_kpm: Array,                     # [B, L_max] True=masked
             mem_k: Array, mem_v: Array,          # [B, S, E]
             memory_key_padding_mask: Optional[Array],
             train: bool = False,
             ) -> Tuple[Array, Array, Array]:
        """One decode step at position ``t`` (traced scalar).

        Returns (out_t [B, E], updated self_k, updated self_v).  The
        caller maintains ``self_kpm`` so that positions > t and pad
        tokens are masked (== torch causal + tgt_key_padding masking).

        ``train=True`` applies the same dropout placements as __call__
        (scheduled-sampling training decodes through this path); cached
        K/V keep the noise of the step that produced them.
        """
        drop = lambda y: (self.dropout_layer(y, deterministic=False)
                          if train and self.dropout > 0 else y)
        k_t, v_t = self.self_attn.project_kv(x_t[:, None, :], x_t[:, None, :])
        self_k = jax.lax.dynamic_update_slice_in_dim(self_k, k_t, t, axis=1)
        self_v = jax.lax.dynamic_update_slice_in_dim(self_v, v_t, t, axis=1)
        sa = self.self_attn.attend_step(x_t, self_k, self_v, self_kpm,
                                        train=train)
        x = self.norm1(x_t + drop(sa))
        ca = self.cross_attn.attend_step(x, mem_k, mem_v,
                                         memory_key_padding_mask,
                                         train=train)
        x = self.norm2(x + drop(ca))
        x = self.norm3(x + drop(self._ffn(x, drop)))
        return x, self_k, self_v


def causal_mask(length: int, dtype=jnp.float32) -> Array:
    """Additive causal mask: 0 on/below diagonal, -inf above
    (reference generate_square_subsequent_mask)."""
    mask = jnp.triu(jnp.full((length, length), -jnp.inf, dtype), k=1)
    return mask
