"""Bahdanau-attention GRU caption decoders (TPU re-design of
captioning/models/rnn_decoder.py:74-215 and hf_wrapper.py:1377-1554).

The reference decodes step-by-step in Python even during training
(attn_model.py:22-25).  Here the step is a pure function consumed by the
batched decoding engine's ``lax.scan`` / ``lax.while_loop``, with the RNN
hidden state and attention carried in an explicit cache pytree (beam
reordering is a ``jnp.take`` over that pytree, replacing the reference's
per-sample state reindexing, attn_model.py:112-116).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import GRUCellStack, torch_linear_init
from audiocaption_tpu.ops.masking import length_mask

Array = jnp.ndarray


class Seq2SeqAttention(nn.Module):
    """Additive attention (rnn_decoder.py:74-112): score =
    v . tanh(W [h_dec; h_enc]); padded positions filled with -1e10."""
    attn_size: int

    @nn.compact
    def __call__(self, h_dec: Array, h_enc: Array, src_lens: Array
                 ) -> Tuple[Array, Array]:
        """h_dec: [N, hs_dec]; h_enc: [N, S, hs_enc] -> (ctx, weights)."""
        S = h_enc.shape[1]
        q = jnp.broadcast_to(h_dec[:, None, :],
                             (h_dec.shape[0], S, h_dec.shape[-1]))
        attn_in = jnp.concatenate([q, h_enc], axis=-1)
        attn_out = jnp.tanh(nn.Dense(self.attn_size,
                                     kernel_init=torch_linear_init,
                                     name="h2attn")(attn_in))
        v = self.param("v", nn.initializers.normal(1.0), (self.attn_size,))
        score = jnp.einsum("nsa,a->ns", attn_out, v)
        mask = length_mask(src_lens, S)
        score = jnp.where(mask, score, -1e10)
        weights = jax.nn.softmax(score, axis=-1)
        ctx = jnp.einsum("ns,nse->ne", weights, h_enc)
        return ctx, weights


class BahAttnCatFcDecoder(nn.Module):
    """cat(word_emb, ctx_proj, fc_proj) -> GRU -> classifier
    (rnn_decoder.py:159-215)."""
    emb_dim: int
    vocab_size: int
    fc_emb_dim: int
    attn_emb_dim: int
    d_model: int
    dropout: float = 0.5
    num_layers: int = 1
    attn_size: Optional[int] = None

    def setup(self):
        a_size = self.attn_size if self.attn_size is not None else self.d_model
        self.word_embedding = nn.Embed(
            self.vocab_size, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="word_embedding")
        self.model = GRUCellStack(hidden_size=self.d_model,
                                  num_layers=self.num_layers, name="model")
        self.attn = Seq2SeqAttention(a_size, name="attn")
        self.fc_proj = nn.Dense(self.emb_dim, kernel_init=torch_linear_init,
                                name="fc_proj")
        self.ctx_proj = nn.Dense(self.emb_dim, kernel_init=torch_linear_init,
                                 name="ctx_proj")
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=torch_linear_init,
                                   name="classifier")
        self.dropout_layer = nn.Dropout(self.dropout)

    def _drop(self, x: Array, train: bool) -> Array:
        if train and self.dropout > 0:
            return self.dropout_layer(x, deterministic=False)
        return x

    def init_cache(self, attn_emb: Array, attn_emb_len: Array,
                   fc_emb: Array, max_length: int
                   ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        """-> (static, dynamic) decode caches.

        The RNN state carried in ``dynamic`` starts as zeros and its
        beam reorder (a jnp.take in the engine) mirrors the reference's
        state reindexing by prev_words_beam (attn_model.py:112-116).
        """
        B = attn_emb.shape[0]
        static = {
            "attn_emb": attn_emb,
            "attn_emb_len": attn_emb_len,
            "p_fc": self.fc_proj(fc_emb),
        }
        # engine gathers dyn leaves on axis 0 -> state stored [B, L, H]
        dyn = {
            "state": jnp.zeros((B, self.num_layers, self.d_model),
                               jnp.float32),
            "attn_weight": jnp.zeros((B, attn_emb.shape[1]), jnp.float32),
        }
        return static, dyn

    def _embed_input(self, word_t: Array, t: Array, static: Dict[str, Any],
                     train: bool) -> Array:
        return self._drop(self.word_embedding(word_t), train)

    def step(self, word_t: Array, t: Array, static: Dict[str, Any],
             dyn: Dict[str, Any], train: bool = False
             ) -> Tuple[Array, Dict[str, Any]]:
        """word_t: [B] -> (logit [B, V], new dynamic cache).

        Query is the flattened hidden state of the *previous* step
        (rnn_decoder.py:196-200)."""
        embed = self._embed_input(word_t, t, static, train)
        state = jnp.transpose(dyn["state"], (1, 0, 2))   # [L, B, H]
        query = jnp.transpose(state, (1, 0, 2)).reshape(state.shape[1], -1)
        ctx, attn_weight = self.attn(query, static["attn_emb"],
                                     static["attn_emb_len"])
        rnn_input = jnp.concatenate(
            [embed, self.ctx_proj(ctx), static["p_fc"]], axis=-1)
        out, new_state = self.model(rnn_input, state)
        logit = self.classifier(out)
        new_dyn = {"state": jnp.transpose(new_state, (1, 0, 2)),
                   "attn_weight": attn_weight}
        return logit.astype(jnp.float32), new_dyn


class TemporalBahAttnDecoder(BahAttnCatFcDecoder):
    """BahAttnCatFcDecoder whose t=0 input embedding is a learned
    temporal-tag embedding instead of <bos> (hf_wrapper.py:1502-1554)."""

    def setup(self):
        super().setup()
        self.temporal_embedding = nn.Embed(
            4, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="temporal_embedding")

    def _embed_input(self, word_t: Array, t: Array, static: Dict[str, Any],
                     train: bool) -> Array:
        word_emb = self.word_embedding(word_t)
        tag_emb = self.temporal_embedding(static["temporal_tag"])
        emb = jnp.where(jnp.equal(t, 0), tag_emb, word_emb)
        return self._drop(emb, train)

    def init_cache(self, attn_emb: Array, attn_emb_len: Array,
                   fc_emb: Array, max_length: int,
                   temporal_tag: Optional[Array] = None):
        static, dyn = super().init_cache(attn_emb, attn_emb_len, fc_emb,
                                         max_length)
        if temporal_tag is None:
            temporal_tag = jnp.zeros((attn_emb.shape[0],), jnp.int32)
        static["temporal_tag"] = temporal_tag
        return static, dyn


def convert_bahattn_decoder(sd, prefix: str = "", num_layers: int = 1,
                            temporal: bool = False) -> Dict:
    """torch BahAttnCatFcDecoder / TemporalBahAttnDecoder -> params."""
    k = lambda name: f"{prefix}.{name}" if prefix else name
    params: Dict[str, Any] = {
        "word_embedding": convert.embedding(sd, k("word_embedding")),
        "model": convert.gru_cell_stack(sd, k("model"), num_layers),
        "attn": {
            "h2attn": convert.linear(sd, k("attn.h2attn")),
            "v": sd[k("attn.v")],
        },
        "fc_proj": convert.linear(sd, k("fc_proj")),
        "ctx_proj": convert.linear(sd, k("ctx_proj")),
        "classifier": convert.linear(sd, k("classifier")),
    }
    if temporal:
        params["temporal_embedding"] = convert.embedding(
            sd, k("temporal_embedding"))
    return params


class RnnFcDecoder(nn.Module):
    """GRU decoder conditioned only on the pooled fc embedding
    (rnn_decoder.py:46-75, used by FcModel, fc_model.py:10-141):
    rnn_input = cat(word_emb, fc_proj)."""
    emb_dim: int
    vocab_size: int
    fc_emb_dim: int
    d_model: int
    attn_emb_dim: int = 0   # API parity; unused
    dropout: float = 0.5
    num_layers: int = 1

    def setup(self):
        self.word_embedding = nn.Embed(
            self.vocab_size, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="word_embedding")
        self.model = GRUCellStack(hidden_size=self.d_model,
                                  num_layers=self.num_layers, name="model")
        self.fc_proj = nn.Dense(self.emb_dim, kernel_init=torch_linear_init,
                                name="fc_proj")
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=torch_linear_init,
                                   name="classifier")
        self.dropout_layer = nn.Dropout(self.dropout)

    def _drop(self, x, train):
        if train and self.dropout > 0:
            return self.dropout_layer(x, deterministic=False)
        return x

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length):
        B = fc_emb.shape[0]
        static = {"p_fc": self.fc_proj(fc_emb)}
        dyn = {"state": jnp.zeros((B, self.num_layers, self.d_model),
                                  jnp.float32)}
        return static, dyn

    def step(self, word_t, t, static, dyn, train=False):
        embed = self._drop(self.word_embedding(word_t), train)
        state = jnp.transpose(dyn["state"], (1, 0, 2))
        rnn_input = jnp.concatenate([embed, static["p_fc"]], axis=-1)
        out, new_state = self.model(rnn_input, state)
        return (self.classifier(out).astype(jnp.float32),
                {"state": jnp.transpose(new_state, (1, 0, 2))})


class BahAttnAddFcDecoder(BahAttnCatFcDecoder):
    """Additive fusion variant (rnn_decoder.py:218-273):
    rnn_input = word_emb + ctx + fc_proj, attention over *projected*
    memory (attn_proj to emb_dim)."""

    def setup(self):
        a_size = self.attn_size if self.attn_size is not None else self.d_model
        self.word_embedding = nn.Embed(
            self.vocab_size, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="word_embedding")
        self.model = GRUCellStack(hidden_size=self.d_model,
                                  num_layers=self.num_layers, name="model")
        self.attn = Seq2SeqAttention(a_size, name="attn")
        self.fc_proj = nn.Dense(self.emb_dim, kernel_init=torch_linear_init,
                                name="fc_proj")
        self.attn_proj = nn.Dense(self.emb_dim,
                                  kernel_init=torch_linear_init,
                                  name="attn_proj")
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=torch_linear_init,
                                   name="classifier")
        self.dropout_layer = nn.Dropout(self.dropout)

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length):
        B = attn_emb.shape[0]
        static = {
            "attn_emb": self.attn_proj(attn_emb),   # projected memory
            "attn_emb_len": attn_emb_len,
            "p_fc": self.fc_proj(fc_emb),
        }
        dyn = {"state": jnp.zeros((B, self.num_layers, self.d_model),
                                  jnp.float32),
               "attn_weight": jnp.zeros((B, attn_emb.shape[1]),
                                        jnp.float32)}
        return static, dyn

    def step(self, word_t, t, static, dyn, train=False):
        embed = self._drop(self.word_embedding(word_t), train)
        state = jnp.transpose(dyn["state"], (1, 0, 2))
        query = jnp.transpose(state, (1, 0, 2)).reshape(state.shape[1], -1)
        ctx, attn_weight = self.attn(query, static["attn_emb"],
                                     static["attn_emb_len"])
        rnn_input = embed + ctx + static["p_fc"]
        out, new_state = self.model(rnn_input, state)
        return (self.classifier(out).astype(jnp.float32),
                {"state": jnp.transpose(new_state, (1, 0, 2)),
                 "attn_weight": attn_weight})


class ConditionalBahAttnDecoder(BahAttnCatFcDecoder):
    """2-class condition variant (rnn_decoder.py:277-345): the fc slot is
    replaced by a soft condition embedding [1-c, c] @ E."""

    def setup(self):
        super().setup()
        self.condition_embedding = nn.Embed(
            2, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="condition_embedding")

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length,
                   condition=None):
        static, dyn = super().init_cache(attn_emb, attn_emb_len, fc_emb,
                                         max_length)
        if condition is None:
            condition = jnp.zeros((attn_emb.shape[0],), jnp.float32)
        soft = jnp.stack([1.0 - condition, condition], axis=-1)
        static["p_fc"] = soft @ self.condition_embedding.embedding
        return static, dyn


class StyleBahAttnDecoder(BahAttnCatFcDecoder):
    """Style-vector variant (rnn_decoder.py:412-466): the fc slot is a
    caller-provided style vector (already emb_dim)."""

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length,
                   style=None):
        static, dyn = super().init_cache(attn_emb, attn_emb_len, fc_emb,
                                         max_length)
        if style is not None:
            static["p_fc"] = style
        return static, dyn


class SpecificityBahAttnDecoder(BahAttnCatFcDecoder):
    """Scalar-specificity variant (rnn_decoder.py:519-575): raw context
    (no projection) and a scalar condition concatenated to the rnn
    input."""

    def setup(self):
        a_size = self.attn_size if self.attn_size is not None else self.d_model
        self.word_embedding = nn.Embed(
            self.vocab_size, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="word_embedding")
        self.model = GRUCellStack(hidden_size=self.d_model,
                                  num_layers=self.num_layers, name="model")
        self.attn = Seq2SeqAttention(a_size, name="attn")
        self.classifier = nn.Dense(self.vocab_size,
                                   kernel_init=torch_linear_init,
                                   name="classifier")
        self.dropout_layer = nn.Dropout(self.dropout)

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length,
                   condition=None):
        B = attn_emb.shape[0]
        if condition is None:
            condition = jnp.zeros((B,), jnp.float32)
        static = {
            "attn_emb": attn_emb,
            "attn_emb_len": attn_emb_len,
            "condition": condition,
        }
        dyn = {"state": jnp.zeros((B, self.num_layers, self.d_model),
                                  jnp.float32),
               "attn_weight": jnp.zeros((B, attn_emb.shape[1]),
                                        jnp.float32)}
        return static, dyn

    def step(self, word_t, t, static, dyn, train=False):
        embed = self._drop(self.word_embedding(word_t), train)
        state = jnp.transpose(dyn["state"], (1, 0, 2))
        query = jnp.transpose(state, (1, 0, 2)).reshape(state.shape[1], -1)
        ctx, attn_weight = self.attn(query, static["attn_emb"],
                                     static["attn_emb_len"])
        rnn_input = jnp.concatenate(
            [embed, ctx, static["condition"][:, None]], axis=-1)
        out, new_state = self.model(rnn_input, state)
        return (self.classifier(out).astype(jnp.float32),
                {"state": jnp.transpose(new_state, (1, 0, 2)),
                 "attn_weight": attn_weight})


class StructBahAttnDecoder(BahAttnCatFcDecoder):
    """Structure-conditioned variant (rnn_decoder.py:340-398): the fc
    slot carries a learned structure embedding."""
    struct_vocab_size: int = 4

    def setup(self):
        super().setup()
        self.struct_embedding = nn.Embed(
            self.struct_vocab_size, self.emb_dim,
            embedding_init=nn.initializers.xavier_uniform(),
            name="struct_embedding")

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length,
                   structure=None):
        static, dyn = super().init_cache(attn_emb, attn_emb_len, fc_emb,
                                         max_length)
        if structure is None:
            structure = jnp.zeros((attn_emb.shape[0],), jnp.int32)
        static["p_fc"] = self.struct_embedding(structure)
        return static, dyn


class BahAttnDecoder(BahAttnCatFcDecoder):
    """Raw-context concat variant (rnn_decoder.py:468-517):
    rnn_input = cat(word_emb, ctx_proj(ctx)) — no fc slot."""

    def init_cache(self, attn_emb, attn_emb_len, fc_emb, max_length):
        static, dyn = super().init_cache(attn_emb, attn_emb_len, fc_emb,
                                         max_length)
        static.pop("p_fc")
        return static, dyn

    def step(self, word_t, t, static, dyn, train=False):
        embed = self._drop(self.word_embedding(word_t), train)
        state = jnp.transpose(dyn["state"], (1, 0, 2))
        query = jnp.transpose(state, (1, 0, 2)).reshape(state.shape[1], -1)
        ctx, attn_weight = self.attn(query, static["attn_emb"],
                                     static["attn_emb_len"])
        rnn_input = jnp.concatenate([embed, self.ctx_proj(ctx)], axis=-1)
        out, new_state = self.model(rnn_input, state)
        return (self.classifier(out).astype(jnp.float32),
                {"state": jnp.transpose(new_state, (1, 0, 2)),
                 "attn_weight": attn_weight})
