"""Transformer caption decoder (TPU re-design of
captioning/models/transformer_decoder.py:11-103).

Two execution paths over one parameter set:

  * ``__call__`` — full-sequence causal forward (training / scoring):
    one MXU-friendly pass over [B, L] tokens.
  * ``init_cache`` + ``step`` — KV-cached single-token decode used by the
    batched decoding engine.  The reference recomputes the whole prefix
    every generation step (transformer_model.py:34-86); the cache makes
    each step O(L) instead of O(L^2) and keeps shapes static for XLA.

Semantics pinned to the reference:
  * word embedding -> dropout -> * sqrt(emb_dim) -> +sinusoidal PE
    (max_len 100) -> PE dropout   (transformer_decoder.py:89-91)
  * memory projection Linear+ReLU+Dropout+LayerNorm  (:38-43)
  * n post-norm torch TransformerDecoderLayers (nhead = d/64, ff = 4d)
  * classifier without bias, optionally tied to the embedding (:35-37)
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import (
    LayerNorm, TransformerDecoderLayer, causal_mask, sinusoidal_positions,
    torch_linear_init)
from audiocaption_tpu.ops.masking import length_mask

Array = jnp.ndarray


class TransformerDecoder(nn.Module):
    emb_dim: int
    vocab_size: int
    attn_emb_dim: int
    fc_emb_dim: int = 0            # unused by this decoder (API parity)
    dropout: float = 0.2
    nlayers: int = 2
    nhead: Optional[int] = None
    dim_feedforward: Optional[int] = None
    tie_weights: bool = False
    max_pos: int = 100
    compute_dtype: Any = jnp.float32

    @property
    def _nhead(self) -> int:
        return self.nhead if self.nhead is not None else self.emb_dim // 64

    @property
    def _ff(self) -> int:
        return (self.dim_feedforward if self.dim_feedforward is not None
                else self.emb_dim * 4)

    def setup(self):
        cd = self.compute_dtype
        self.word_embedding = nn.Embed(
            self.vocab_size, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            param_dtype=jnp.float32, name="word_embedding")
        self.attn_proj_dense = nn.Dense(self.emb_dim,
                                        kernel_init=torch_linear_init,
                                        dtype=cd, param_dtype=jnp.float32,
                                        name="attn_proj_dense")
        self.attn_proj_norm = LayerNorm(compute_dtype=cd,
                                        name="attn_proj_norm")
        self.layers = [TransformerDecoderLayer(
            d_model=self.emb_dim, num_heads=self._nhead,
            dim_feedforward=self._ff, dropout=self.dropout,
            compute_dtype=cd, name=f"layer{i}")
            for i in range(self.nlayers)]
        if not self.tie_weights:
            self.classifier = nn.Dense(self.vocab_size, use_bias=False,
                                       kernel_init=torch_linear_init,
                                       dtype=cd, param_dtype=jnp.float32,
                                       name="classifier")
        self.dropout_layer = nn.Dropout(self.dropout)
        # The positional table is a LOADABLE, non-trainable param: the
        # reference registers it as an nn.Parameter and its init_params
        # xavier-reinitializes every >1-dim param INCLUDING the PE
        # (transformer_decoder.py:29,51-54), so trained reference
        # checkpoints carry a random frozen table, not sinusoids.  We
        # default to sinusoids (the sane choice for new models), load
        # checkpoint values via the converter, stop_gradient it here,
        # and make_optimizer masks any param named "pe" out of updates.
        self.pe_param = self.param(
            "pe", lambda rng: jnp.asarray(
                sinusoidal_positions(self.max_pos, self.emb_dim)))

    @property
    def pe(self) -> Array:
        return jax.lax.stop_gradient(self.pe_param)

    def _drop(self, x: Array, train: bool) -> Array:
        if train and self.dropout > 0:
            return self.dropout_layer(x, deterministic=False)
        return x

    def _logits(self, h: Array) -> Array:
        if self.tie_weights:
            emb = self.word_embedding.embedding.astype(h.dtype)
            return h @ emb.T
        return self.classifier(h)

    def _project_memory(self, attn_emb: Array, train: bool) -> Array:
        """Linear+ReLU+Dropout+LayerNorm over encoder memory (:38-43)."""
        h = nn.relu(self.attn_proj_dense(
            attn_emb.astype(self.compute_dtype)))
        h = self._drop(h, train)
        return self.attn_proj_norm(h)

    def _embed(self, word: Array, pos_offset, train: bool) -> Array:
        """embedding -> dropout -> *sqrt(d) -> +PE -> dropout."""
        e = self.word_embedding(word)
        e = self._drop(e, train) * math.sqrt(self.emb_dim)
        T = word.shape[-1]
        if isinstance(pos_offset, int) and pos_offset == 0:
            pe = self.pe[:T]
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pe, pos_offset, T, axis=0)
        e = e + pe[None, :, :]
        return self._drop(e, train).astype(self.compute_dtype)

    def __call__(self, word: Array, attn_emb: Array, attn_emb_len: Array,
                 cap_padding_mask: Optional[Array] = None,
                 train: bool = False) -> Dict[str, Array]:
        """word: [B, L] token ids -> {logit [B, L, V], embed [B, L, E]}."""
        memory = self._project_memory(attn_emb, train)
        mem_kpm = ~length_mask(attn_emb_len, attn_emb.shape[1])
        x = self._embed(word, 0, train)
        tgt_mask = causal_mask(word.shape[1])
        for layer in self.layers:
            x = layer(x, memory, tgt_mask=tgt_mask,
                      tgt_key_padding_mask=cap_padding_mask,
                      memory_key_padding_mask=mem_kpm, train=train)
        x = x.astype(jnp.float32)
        return {"logit": self._logits(x).astype(jnp.float32), "embed": x}

    # ---------------------------------------------------------- decode ----

    def init_cache(self, attn_emb: Array, attn_emb_len: Array,
                   max_length: int
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """Precompute memory K/V and allocate self-attn caches.

        Returns (static, dynamic): ``static`` is read-only during decode
        (never gathered on beam reorder), ``dynamic`` is the per-step
        mutable state the decoding engine threads and reorders.
        """
        B = attn_emb.shape[0]
        memory = self._project_memory(attn_emb, False)
        mem_kpm = ~length_mask(attn_emb_len, attn_emb.shape[1])
        static: Dict[str, Any] = {"mem_kpm": mem_kpm}
        dyn: Dict[str, Any] = {}
        for i, layer in enumerate(self.layers):
            mk, mv = layer.precompute_memory(memory)
            static[f"mem_k{i}"], static[f"mem_v{i}"] = mk, mv
            dyn[f"self_k{i}"] = jnp.zeros(
                (B, max_length, self.emb_dim), self.compute_dtype)
            dyn[f"self_v{i}"] = jnp.zeros(
                (B, max_length, self.emb_dim), self.compute_dtype)
        # pad-token flags for generated prefix (reference masks pad
        # tokens in self-attention: transformer_model.py:55-57,85-86)
        dyn["self_pad"] = jnp.zeros((B, max_length), bool)
        return static, dyn

    def _embed_step(self, word_t: Array, t: Array, train: bool,
                    static: Dict[str, Any]) -> Array:
        """Embed the single fed token (subclass hook: the conditioned
        decoders add static['cond'] here)."""
        return self._embed(word_t[:, None], t, train)[:, 0]

    def _step_hidden(self, word_t: Array, t: Array, static: Dict[str, Any],
                     dyn: Dict[str, Any], is_pad_t: Optional[Array] = None,
                     train: bool = False
                     ) -> Tuple[Array, Dict[str, Any]]:
        """One decode step up to the final hidden state (pre-classifier).

        Returns (hidden [B, E] float32, updated dynamic cache).
        """
        B = word_t.shape[0]
        L = dyn["self_k0"].shape[1]
        if is_pad_t is None:
            is_pad_t = jnp.zeros((B,), bool)
        self_pad = jax.lax.dynamic_update_slice_in_dim(
            dyn["self_pad"], is_pad_t[:, None], t, axis=1)
        # mask: future positions OR pad tokens
        kpm = (jnp.arange(L)[None, :] > t) | self_pad
        x = self._embed_step(word_t, t, train, static)
        new_dyn = {"self_pad": self_pad}
        for i, layer in enumerate(self.layers):
            x, sk, sv = layer.step(
                x, t, dyn[f"self_k{i}"], dyn[f"self_v{i}"], kpm,
                static[f"mem_k{i}"], static[f"mem_v{i}"], static["mem_kpm"],
                train=train)
            new_dyn[f"self_k{i}"], new_dyn[f"self_v{i}"] = sk, sv
        return x.astype(jnp.float32), new_dyn

    def step(self, word_t: Array, t: Array, static: Dict[str, Any],
             dyn: Dict[str, Any], is_pad_t: Optional[Array] = None
             ) -> Tuple[Array, Dict[str, Any]]:
        """One decode step. word_t: [B] ids; t: traced position scalar.

        Returns (logit [B, V], updated dynamic cache).
        """
        x, new_dyn = self._step_hidden(word_t, t, static, dyn, is_pad_t)
        return self._logits(x).astype(jnp.float32), new_dyn


def convert_transformer_decoder(sd, prefix: str = "",
                                nlayers: int = 2,
                                tie_weights: bool = False) -> Dict:
    """torch TransformerDecoder (reference naming) -> params.

    torch keys: word_embedding.weight, attn_proj.{0,3}.*,
    model.layers.{i}.*, classifier.weight (absent when tied).
    """
    k = lambda name: f"{prefix}.{name}" if prefix else name
    params: Dict[str, Any] = {
        "word_embedding": convert.embedding(sd, k("word_embedding")),
        "attn_proj_dense": convert.linear(sd, k("attn_proj.0")),
        "attn_proj_norm": convert.layernorm(sd, k("attn_proj.3")),
    }
    if k("pos_encoder.pe") in sd:
        # checkpoint PE table [max_len, 1, d] -> [max_len, d]; reference
        # checkpoints carry an xavier-random frozen table because
        # init_params reinitializes the pe parameter
        # (transformer_decoder.py:29,51-54, model_util.py:181-186)
        params["pe"] = sd[k("pos_encoder.pe")][:, 0, :]
    for i in range(nlayers):
        params[f"layer{i}"] = convert.transformer_decoder_layer(
            sd, k(f"model.layers.{i}"))
    if not tie_weights:
        params["classifier"] = convert.linear(sd, k("classifier"), bias=False)
    return params


class EventTransformerDecoder(TransformerDecoder):
    """AudioSet-event conditioned decoder
    (transformer_decoder.py:146-174): a per-sample event embedding is
    added to the scaled word embeddings before positional encoding.  The
    event embedding comes from EventEncoder: the 527-class label
    distribution times a learned embedding table
    (transformer_model.py:166-178)."""
    event_classes: int = 527

    def setup(self):
        super().setup()
        self.event_embedding = nn.Embed(
            self.event_classes, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="event_embedding")

    def encode_event(self, event_probs: Array) -> Array:
        """[N, classes] label distribution -> [N, emb_dim]."""
        probs = event_probs / jnp.maximum(
            jnp.sum(event_probs, axis=-1, keepdims=True), 1e-8)
        return probs @ self.event_embedding.embedding

    def _embed(self, word, pos_offset, train, cond=None):
        e = self.word_embedding(word)
        e = self._drop(e, train) * math.sqrt(self.emb_dim)
        if cond is not None:
            e = e + cond[:, None, :]
        T = word.shape[-1]
        if isinstance(pos_offset, int) and pos_offset == 0:
            pe = self.pe[:T]
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pe, pos_offset, T, axis=0)
        e = e + pe[None, :, :]
        return self._drop(e, train).astype(self.compute_dtype)

    def __call__(self, word, attn_emb, attn_emb_len,
                 cap_padding_mask=None, train=False, event=None):
        memory = self._project_memory(attn_emb, train)
        mem_kpm = ~length_mask(attn_emb_len, attn_emb.shape[1])
        cond = self.encode_event(event) if event is not None else None
        x = self._embed(word, 0, train, cond)
        tgt_mask = causal_mask(word.shape[1])
        for layer in self.layers:
            x = layer(x, memory, tgt_mask=tgt_mask,
                      tgt_key_padding_mask=cap_padding_mask,
                      memory_key_padding_mask=mem_kpm, train=train)
        x = x.astype(jnp.float32)
        return {"logit": self._logits(x).astype(jnp.float32), "embed": x}

    def init_cache(self, attn_emb, attn_emb_len, max_length, event=None):
        static, dyn = super().init_cache(attn_emb, attn_emb_len, max_length)
        if event is not None:
            static["cond"] = self.encode_event(event)
        return static, dyn

    def _embed_step(self, word_t, t, train, static):
        return self._embed(word_t[:, None], t, train,
                           static.get("cond"))[:, 0]


class KeywordProbTransformerDecoder(EventTransformerDecoder):
    """Keyword-probability conditioned decoder
    (transformer_decoder.py:177-214): keyword probs are projected and
    added to word embeddings, followed by a LayerNorm, before PE."""
    keyword_classes_num: int = 527

    def setup(self):
        TransformerDecoder.setup(self)
        self.keyword_proj = nn.Dense(self.emb_dim,
                                     kernel_init=torch_linear_init,
                                     name="keyword_proj")
        self.word_keyword_norm = LayerNorm(name="word_keyword_norm")

    def encode_event(self, keyword_probs: Array) -> Array:
        return self.keyword_proj(keyword_probs)

    def _embed(self, word, pos_offset, train, cond=None):
        e = self.word_embedding(word)
        e = self._drop(e, train) * math.sqrt(self.emb_dim)
        if cond is not None:
            e = self.word_keyword_norm(e + cond[:, None, :])
        T = word.shape[-1]
        if isinstance(pos_offset, int) and pos_offset == 0:
            pe = self.pe[:T]
        else:
            pe = jax.lax.dynamic_slice_in_dim(self.pe, pos_offset, T, axis=0)
        e = e + pe[None, :, :]
        return self._drop(e, train).astype(self.compute_dtype)
