"""Meshed-Memory (M2) transformer encoder/decoder — a NATIVE build of
the reference's import-guarded external dependency.

The reference wraps the `m2transformer` pip package (Cornia et al.,
"Meshed-Memory Transformer for Image Captioning", CVPR 2020) behind
ImportError guards:

  * ``M2TransformerEncoder``  — captioning/models/transformer_encoder.py:22-62
    (``MemoryAugmentedEncoder`` + ``ScaledDotProductAttentionMemory``,
    m=40 memory slots per layer, outputs of ALL layers kept);
  * ``M2TransformerDecoder``  — captioning/models/transformer_decoder.py:106-143
    (``MeshedDecoder``: every decoder layer cross-attends to every
    encoder level through learned sigmoid gates);
  * ``M2TransformerModel``    — captioning/models/transformer_model.py:89-135
    (full-prefix stepwise decode — the package has no KV cache).

Here both modules are implemented natively in flax from the paper +
package semantics, so they build and run without any external package —
and decode through the SAME cached ``init_cache``/``step`` protocol as
:class:`TransformerDecoder`, making each step O(1) decoder work instead
of the reference's O(t) full-prefix re-forward (and giving M2 models
batched greedy/beam/DBS on the engine for free).

Faithfulness notes (no torch oracle exists in this environment — the
package is not installed for the reference either):
  * encoder memory-slot init: ``m_k ~ N(0, 1/d_k)``, ``m_v ~ N(0, 1/m)``
    and the ``sqrt(d_k)``/``sqrt(m)`` rescale at use, as in the package;
  * attention residuals are post-LN INSIDE the attention block
    (``LN(q + dropout(out))``) and the FFN is ``LN(x + dropout(
    fc2(dropout(relu(fc1(x))))))`` — the package's layer structure,
    which differs from torch's ``nn.TransformerDecoderLayer``;
  * the package's ``MeshedDecoderLayer`` HARDCODES 3 encoder levels
    (``fc_alpha1..3``); with the reference's default ``nlayers=2``
    encoder that indexes out of bounds — here the gate count follows
    ``n_enc_levels`` and the meshed sum divides by ``sqrt(n_levels)``;
  * the package infers feature padding from all-zero feature rows; here
    the padding mask comes from ``attn_len`` (equivalent for the
    framework's padded feature batches, and shape-static for XLA);
  * decoder positions are 1-based with pad tokens pinned to the zeroed
    row 0 of the sinusoid table (package ``sinusoid_encoding_table``
    with ``padding_idx=0``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models.layers import (
    LayerNorm, sinusoidal_positions, torch_linear_init)
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder
from audiocaption_tpu.ops.masking import length_mask

Array = jnp.ndarray

NEG_BIAS = -1e9


def _split_heads(x: Array, nhead: int) -> Array:
    """[B, T, d] -> [B, h, T, d_h]."""
    B, T, d = x.shape
    return jnp.transpose(x.reshape(B, T, nhead, d // nhead), (0, 2, 1, 3))


def _merge_heads(x: Array) -> Array:
    """[B, h, T, d_h] -> [B, T, d]."""
    B, h, T, dh = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(B, T, h * dh)


class M2Attention(nn.Module):
    """Package ``MultiHeadAttention`` (+ optional
    ``ScaledDotProductAttentionMemory`` slots): projections, scaled dot
    product with ``n_memory`` learned unmasked key/value slots, output
    projection, dropout, and the post-LN residual on the queries."""
    d_model: int
    nhead: int
    dropout: float = 0.1
    n_memory: int = 0
    compute_dtype: Any = jnp.float32

    def setup(self):
        cd = self.compute_dtype
        dense = lambda name: nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            dtype=cd, param_dtype=jnp.float32, name=name)
        self.fc_q = dense("fc_q")
        self.fc_k = dense("fc_k")
        self.fc_v = dense("fc_v")
        self.fc_o = dense("fc_o")
        self.norm = LayerNorm(compute_dtype=cd, name="norm")
        self.drop = nn.Dropout(self.dropout)
        if self.n_memory:
            d_k = self.d_model // self.nhead
            self.m_k = self.param(
                "m_k", nn.initializers.normal(1.0 / d_k),
                (self.n_memory, self.d_model))
            self.m_v = self.param(
                "m_v", nn.initializers.normal(1.0 / self.n_memory),
                (self.n_memory, self.d_model))

    def project_kv(self, kv: Array) -> Tuple[Array, Array]:
        """Projected keys/values WITHOUT memory slots (cacheable)."""
        return self.fc_k(kv.astype(self.compute_dtype)), \
            self.fc_v(kv.astype(self.compute_dtype))

    def memory_kv(self, B: int) -> Tuple[Array, Array]:
        """The rescaled memory slots, broadcast to the batch."""
        d_k = self.d_model // self.nhead
        mk = (math.sqrt(d_k) * self.m_k).astype(self.compute_dtype)
        mv = (math.sqrt(self.n_memory) * self.m_v).astype(
            self.compute_dtype)
        tile = lambda m: jnp.broadcast_to(m[None], (B,) + m.shape)
        return tile(mk), tile(mv)

    def attend(self, q_in: Array, k: Array, v: Array,
               key_bias: Optional[Array], train: bool) -> Array:
        """q_in: [B, Tq, d]; k/v: [B, S, d] (memory slots, if any,
        already appended by the caller); key_bias: [B, Tq, S] additive
        pre-softmax bias (0 / NEG_BIAS) covering the REAL keys only —
        callers pad it with zeros over memory-slot columns."""
        d_k = self.d_model // self.nhead
        q = _split_heads(self.fc_q(q_in.astype(self.compute_dtype)),
                         self.nhead)
        kh = _split_heads(k, self.nhead)
        vh = _split_heads(v, self.nhead)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, kh) / math.sqrt(d_k)
        scores = scores.astype(jnp.float32)
        if key_bias is not None:
            scores = scores + key_bias[:, None, :, :]
        att = jax.nn.softmax(scores, axis=-1).astype(self.compute_dtype)
        ctx = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", att, vh))
        out = self.fc_o(ctx)
        if train and self.dropout > 0:
            out = self.drop(out, deterministic=False)
        return self.norm(q_in.astype(self.compute_dtype) + out)

    def __call__(self, q_in: Array, kv: Array,
                 key_bias: Optional[Array] = None,
                 train: bool = False) -> Array:
        k, v = self.project_kv(kv)
        B = q_in.shape[0]
        if self.n_memory:
            mk, mv = self.memory_kv(B)
            k = jnp.concatenate([k, mk], axis=1)
            v = jnp.concatenate([v, mv], axis=1)
            if key_bias is not None:
                key_bias = jnp.pad(
                    key_bias, ((0, 0), (0, 0), (0, self.n_memory)))
        return self.attend(q_in, k, v, key_bias, train)


class M2FeedForward(nn.Module):
    """Package ``PositionWiseFeedForward``:
    ``LN(x + dropout(fc2(dropout(relu(fc1(x))))))``."""
    d_model: int
    dim_feedforward: int
    dropout: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.compute_dtype
        x = x.astype(cd)
        h = nn.relu(nn.Dense(
            self.dim_feedforward,
            kernel_init=nn.initializers.xavier_uniform(),
            dtype=cd, param_dtype=jnp.float32, name="fc1")(x))
        if train and self.dropout > 0:
            h = nn.Dropout(self.dropout, name="drop_inner")(
                h, deterministic=False)
        h = nn.Dense(self.d_model,
                     kernel_init=nn.initializers.xavier_uniform(),
                     dtype=cd, param_dtype=jnp.float32, name="fc2")(h)
        if train and self.dropout > 0:
            h = nn.Dropout(self.dropout, name="drop_outer")(
                h, deterministic=False)
        return LayerNorm(compute_dtype=cd, name="norm")(x + h)


class M2TransformerEncoder(nn.Module):
    """Memory-augmented multi-level encoder over precomputed attention
    features (transformer_encoder.py:22-62).

    Returns ``attn_emb`` of shape **[B, nlayers, T, d_model]** — the
    stacked per-level outputs the meshed decoder consumes — and the
    reference's (unmasked) time-mean as ``fc_emb``
    (transformer_encoder.py:54-60)."""
    d_model: int
    nlayers: int = 2
    nhead: Optional[int] = None
    dim_feedforward: Optional[int] = None
    dropout: float = 0.1
    n_memory: int = 40
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, attn: Array, attn_len: Array,
                 train: bool = False) -> Dict[str, Array]:
        cd = self.compute_dtype
        nhead = self.nhead or self.d_model // 64
        ff = self.dim_feedforward or self.d_model * 4
        x = nn.relu(nn.Dense(
            self.d_model, kernel_init=nn.initializers.xavier_uniform(),
            dtype=cd, param_dtype=jnp.float32,
            name="input_proj")(attn.astype(cd)))
        if train and self.dropout > 0:
            x = nn.Dropout(self.dropout, name="input_drop")(
                x, deterministic=False)
        x = LayerNorm(compute_dtype=cd, name="input_norm")(x)

        T = attn.shape[1]
        valid = length_mask(attn_len, T)                   # [B, T]
        key_bias = jnp.where(valid, 0.0, NEG_BIAS)[:, None, :]
        key_bias = jnp.broadcast_to(key_bias, (attn.shape[0], T, T))

        levels = []
        for i in range(self.nlayers):
            x = M2Attention(self.d_model, nhead, self.dropout,
                            n_memory=self.n_memory, compute_dtype=cd,
                            name=f"layer{i}_attn")(
                x, x, key_bias=key_bias, train=train)
            x = M2FeedForward(self.d_model, ff, self.dropout,
                              compute_dtype=cd, name=f"layer{i}_ff")(
                x, train=train)
            levels.append(x)
        attn_emb = jnp.stack(levels, axis=1).astype(jnp.float32)
        return {"attn_emb": attn_emb,                 # [B, Lyr, T, d]
                "attn_emb_len": attn_len,
                "fc_emb": attn_emb.mean(-2)}          # [B, Lyr, d]


class M2TransformerDecoder(TransformerDecoder):
    """Meshed decoder (transformer_decoder.py:106-143): each layer
    self-attends over the caption prefix, cross-attends to EVERY
    encoder level through one shared attention block, and combines the
    per-level contexts with learned sigmoid gates
    ``alpha_j = sigmoid(W_j [self; ctx_j] + b_j)``, summed / sqrt(n).

    Exposes the same three paths as :class:`TransformerDecoder`:
    full-sequence ``__call__`` (teacher forcing / SS), and cached
    ``init_cache`` + ``step`` for the batched decode engine — the
    reference's M2 path recomputes the full prefix per generated token
    (transformer_model.py:104-135) because the wrapped package has no
    cache; logits are a pure function of the prefix, so the cached
    stepwise path is token-identical to that recompute.

    ``emb_dim`` doubles as the package's ``d_model`` (the reference
    sets ``d_model = attn_emb_dim``, transformer_decoder.py:114)."""
    n_enc_levels: int = 2

    def setup(self):
        cd = self.compute_dtype
        d = self.emb_dim
        self.word_embedding = nn.Embed(
            self.vocab_size, d,
            embedding_init=nn.initializers.xavier_uniform(),
            param_dtype=jnp.float32, name="word_embedding")
        # 1-based positions; row 0 (pad) zeroed — package
        # sinusoid_encoding_table(max_len+1, d, padding_idx=0)
        pe = sinusoidal_positions(self.max_pos + 1, d).copy()
        pe[0] = 0.0
        self.pe_param = self.param("pe", lambda rng: jnp.asarray(pe))
        self.self_attn = [
            M2Attention(d, self._nhead, self.dropout, compute_dtype=cd,
                        name=f"layer{i}_self") for i in range(self.nlayers)]
        self.cross_attn = [
            M2Attention(d, self._nhead, self.dropout, compute_dtype=cd,
                        name=f"layer{i}_cross")
            for i in range(self.nlayers)]
        self.gates = [
            [nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(),
                      dtype=cd, param_dtype=jnp.float32,
                      name=f"layer{i}_alpha{j}")
             for j in range(self.n_enc_levels)]
            for i in range(self.nlayers)]
        self.ffs = [
            M2FeedForward(d, self._ff, self.dropout, compute_dtype=cd,
                          name=f"layer{i}_ff") for i in range(self.nlayers)]
        self.classifier = nn.Dense(
            self.vocab_size, kernel_init=nn.initializers.xavier_uniform(),
            dtype=cd, param_dtype=jnp.float32, name="classifier")

    def _logits(self, h: Array) -> Array:
        return self.classifier(h.astype(self.compute_dtype))

    def _meshed_cross(self, i: int, sa: Array, level_kv, key_bias,
                      mask_pad, train: bool) -> Array:
        """Shared cross-attention over every encoder level + gated sum.
        ``level_kv[j]`` is (k, v) already projected (and memory-free —
        the decoder's blocks have no memory slots)."""
        ctxs = []
        for j in range(self.n_enc_levels):
            k, v = level_kv[j]
            c = self.cross_attn[i].attend(sa, k, v, key_bias, train)
            if mask_pad is not None:
                c = c * mask_pad
            ctxs.append(c)
        out = 0.0
        for j, c in enumerate(ctxs):
            alpha = nn.sigmoid(self.gates[i][j](
                jnp.concatenate([sa, c], axis=-1)))
            out = out + alpha * c
        out = out / math.sqrt(self.n_enc_levels)
        if mask_pad is not None:
            out = out * mask_pad
        return out

    def __call__(self, word: Array, attn_emb: Array, attn_emb_len: Array,
                 cap_padding_mask: Optional[Array] = None,
                 train: bool = False) -> Dict[str, Array]:
        """word: [B, T]; attn_emb: [B, n_levels, S, d]."""
        B, T = word.shape
        S = attn_emb.shape[2]
        if cap_padding_mask is None:
            cap_padding_mask = jnp.zeros((B, T), bool)
        mask_pad = (~cap_padding_mask)[:, :, None].astype(
            self.compute_dtype)                            # [B, T, 1]
        # embedding + 1-based positions (pad -> zeroed row 0)
        pos = jnp.where(cap_padding_mask, 0,
                        jnp.arange(1, T + 1)[None, :])
        x = (self.word_embedding(word) + self.pe[pos]).astype(
            self.compute_dtype)
        # self-attention bias: causal OR pad keys
        causal = jnp.tril(jnp.ones((T, T), bool))
        sa_ok = causal[None] & (~cap_padding_mask)[:, None, :]
        sa_bias = jnp.where(sa_ok, 0.0, NEG_BIAS)          # [B, T, T]
        mem_ok = length_mask(attn_emb_len, S)
        mem_bias = jnp.broadcast_to(
            jnp.where(mem_ok, 0.0, NEG_BIAS)[:, None, :], (B, T, S))
        for i in range(self.nlayers):
            sa = self.self_attn[i](x, x, key_bias=sa_bias, train=train)
            sa = sa * mask_pad
            level_kv = [self.cross_attn[i].project_kv(attn_emb[:, j])
                        for j in range(self.n_enc_levels)]
            mc = self._meshed_cross(i, sa, level_kv, mem_bias, mask_pad,
                                    train)
            x = self.ffs[i](mc, train=train) * mask_pad
        x = x.astype(jnp.float32)
        return {"logit": self._logits(x).astype(jnp.float32), "embed": x}

    # ---------------------------------------------------------- decode ----

    def init_cache(self, attn_emb: Array, attn_emb_len: Array,
                   max_length: int
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        B, n_levels, S, _ = attn_emb.shape
        static: Dict[str, Any] = {
            "mem_bias": jnp.where(length_mask(attn_emb_len, S),
                                  0.0, NEG_BIAS)[:, None, :]}  # [B, 1, S]
        dyn: Dict[str, Any] = {}
        for i in range(self.nlayers):
            for j in range(n_levels):
                k, v = self.cross_attn[i].project_kv(attn_emb[:, j])
                static[f"mem_k{i}_{j}"] = k
                static[f"mem_v{i}_{j}"] = v
            dyn[f"self_k{i}"] = jnp.zeros(
                (B, max_length, self.emb_dim), self.compute_dtype)
            dyn[f"self_v{i}"] = jnp.zeros(
                (B, max_length, self.emb_dim), self.compute_dtype)
        dyn["self_pad"] = jnp.zeros((B, max_length), bool)
        return static, dyn

    def _step_hidden(self, word_t: Array, t: Array, static: Dict[str, Any],
                     dyn: Dict[str, Any], is_pad_t: Optional[Array] = None,
                     train: bool = False
                     ) -> Tuple[Array, Dict[str, Any]]:
        B = word_t.shape[0]
        L = dyn["self_k0"].shape[1]
        if is_pad_t is None:
            is_pad_t = jnp.zeros((B,), bool)
        self_pad = jax.lax.dynamic_update_slice_in_dim(
            dyn["self_pad"], is_pad_t[:, None], t, axis=1)
        pos = jnp.where(is_pad_t, 0, t + 1)
        x = (self.word_embedding(word_t) +
             self.pe[pos]).astype(self.compute_dtype)[:, None, :]
        sa_ok = (jnp.arange(L)[None, :] <= t) & ~self_pad
        sa_bias = jnp.where(sa_ok, 0.0, NEG_BIAS)[:, None, :]  # [B, 1, L]
        new_dyn: Dict[str, Any] = {"self_pad": self_pad}
        for i in range(self.nlayers):
            att = self.self_attn[i]
            k_t, v_t = att.project_kv(x)
            sk = jax.lax.dynamic_update_slice_in_dim(
                dyn[f"self_k{i}"], k_t, t, axis=1)
            sv = jax.lax.dynamic_update_slice_in_dim(
                dyn[f"self_v{i}"], v_t, t, axis=1)
            new_dyn[f"self_k{i}"], new_dyn[f"self_v{i}"] = sk, sv
            sa = att.attend(x, sk, sv, sa_bias, train)
            level_kv = [(static[f"mem_k{i}_{j}"], static[f"mem_v{i}_{j}"])
                        for j in range(self.n_enc_levels)]
            mc = self._meshed_cross(i, sa, level_kv, static["mem_bias"],
                                    None, train)
            x = self.ffs[i](mc, train=train)
        return x[:, 0].astype(jnp.float32), new_dyn
