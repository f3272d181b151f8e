"""Fully fused greedy decode: the ENTIRE autoregressive loop (embedding
lookup, N transformer decoder layers with self+cross attention, vocab
projection, argmax, eos bookkeeping, KV caches) runs inside ONE Pallas
kernel with all weights pinned in VMEM.

Why: per-HLO overhead dominates small-decoder decoding on TPU — the XLA
while-loop spends ~10 us per op across ~30 ops per step (measured), so
20 steps cost ~10 ms regardless of beam width or batch.  One kernel
removes that entirely; weights load from HBM once instead of per step.

Key Mosaic-compat tricks:
  * heads are *lane-padded*: head h of Q/K/V lives in lanes
    [h*128, h*128+64) of a [*, H*128] tensor, with the projection
    weights pre-arranged host-side to emit/consume that layout — no
    in-kernel head reshapes (unsupported shape casts);
  * attention scores per head via broadcast-multiply + lane reduction
    (L and S are tiny: <= 32), softmax over the sublane axis;
  * the 1/sqrt(Dh) scale is folded into the Q projection weights;
  * vocabulary is lane-padded to a multiple of 128 with a -1e9 logit
    mask so padded ids never win the argmax.

Semantics match decoding.engine.stepwise_decode(greedy) without early
exit (fixed max_length; finished rows are forced to <eos>), i.e.
token-for-token with the reference greedy loop (base.py:152-168).
"""

from __future__ import annotations

import functools
import warnings
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audiocaption_tpu.models.captioner import Captioner
from audiocaption_tpu.models.layers import sinusoidal_positions
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder

HPAD = 128   # lanes per head block

# Params at or under this size are closed over (constant-folded into the
# HLO) by default — measurably faster, because XLA folds BN scales and
# layout rearrangements of the weights at compile time.  Above it the
# params stay traced jit arguments: a large encoder (Cnn14Rnn ~350 MB
# f32) constant-folded into the program exceeds the axon remote-compile
# request limit (HTTP 413).
BAKE_LIMIT_BYTES = 128 * 1024 * 1024

# The kernels hold the encoder memory K/V and the decode caches fully
# in VMEM, so the feasible kernel chunk depends on the MEMORY LENGTH:
# the defaults (128) are sized for short memories (flagship EffB2,
# S~31).  Long-memory encoders (Cdur5/CRNN families, S~250 at 10 s)
# can push a chunk past the scoped-VMEM budget, which surfaces as a
# Mosaic/remote-compile failure rather than a clean OOM.  Instead of
# modelling the allocator, the decoders degrade gracefully: on a
# compile-shaped failure the chunk is halved (down to 32) and the call
# retried — but ONLY when the smaller chunk actually changes the
# compiled program (halved chunk < batch); past the floor the error
# propagates with the XLA engine (`generate(..., sample_method=...)`)
# as the documented escape hatch.  The markers require explicit
# Pallas/VMEM/remote-compile context so that an unrelated XLA INTERNAL
# error or an HBM OOM of the input batch (which chunking the *kernel*
# cannot fix) propagates on first failure instead of burning
# minutes-long recompiles.  The working chunk is remembered PER padded
# wav length (each static shape is its own program), not by mutating
# the configured default, so one long-memory bucket cannot degrade
# throughput of every later call.
_COMPILE_FALLBACK_MARKERS = ("remote_compile", "Mosaic", "mosaic",
                             "vmem", "VMEM")
MIN_KERNEL_BATCH = 32


def _is_compile_resource_error(e: Exception) -> bool:
    msg = str(e)
    return any(m in msg for m in _COMPILE_FALLBACK_MARKERS)


def _tree_bytes(tree) -> int:
    return sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --------------------------------------------------------------------------
# Host-side weight packing
# --------------------------------------------------------------------------

def _pad_heads_out(w: np.ndarray, nhead: int, dh: int) -> np.ndarray:
    """[in, nhead*dh] -> [in, nhead*HPAD] with head h in lanes
    [h*HPAD, h*HPAD+dh)."""
    out = np.zeros((w.shape[0], nhead * HPAD), w.dtype)
    for h in range(nhead):
        out[:, h * HPAD:h * HPAD + dh] = w[:, h * dh:(h + 1) * dh]
    return out


def _pad_heads_in(w: np.ndarray, nhead: int, dh: int) -> np.ndarray:
    """[nhead*dh, out] -> [nhead*HPAD, out]."""
    out = np.zeros((nhead * HPAD, w.shape[1]), w.dtype)
    for h in range(nhead):
        out[h * HPAD:h * HPAD + dh] = w[h * dh:(h + 1) * dh]
    return out


def pack_decoder_weights(dec: TransformerDecoder,
                         dec_params: Dict) -> Dict[str, np.ndarray]:
    """flax decoder params -> kernel weight dict (numpy, fp32)."""
    E = dec.emb_dim
    H = dec._nhead
    dh = E // H
    g = lambda t: np.asarray(t, np.float32)
    V = dec.vocab_size
    v_pad = _round_up(V, 128)

    emb = g(dec_params["word_embedding"]["embedding"])      # [V, E]
    emb_in = np.zeros((v_pad, E), np.float32)
    emb_in[:V] = emb
    if dec.tie_weights:
        cls_kernel = emb.T                                  # [E, V]
    else:
        cls_kernel = g(dec_params["classifier"]["kernel"])
    emb_out = np.zeros((E, v_pad), np.float32)
    emb_out[:, :V] = cls_kernel

    packed: Dict[str, np.ndarray] = {"emb_in": emb_in, "emb_out": emb_out}
    # pe is a loadable param (reference checkpoints carry a non-sinusoid
    # frozen table, transformer_decoder.py:29,51-54); fall back to the
    # sinusoidal default only for legacy param trees without it
    packed["pe"] = (g(dec_params["pe"]) if "pe" in dec_params
                    else sinusoidal_positions(dec.max_pos, E))

    for i in range(dec.nlayers):
        lp = dec_params[f"layer{i}"]
        sa, ca = lp["self_attn"], lp["cross_attn"]
        scale = 1.0 / np.sqrt(dh)
        packed[f"l{i}_wq"] = _pad_heads_out(g(sa["q_proj"]["kernel"]) * scale,
                                            H, dh)
        packed[f"l{i}_bq"] = _pad_heads_out(
            g(sa["q_proj"]["bias"])[None] * scale, H, dh)
        packed[f"l{i}_wk"] = _pad_heads_out(g(sa["k_proj"]["kernel"]), H, dh)
        packed[f"l{i}_bk"] = _pad_heads_out(g(sa["k_proj"]["bias"])[None],
                                            H, dh)
        packed[f"l{i}_wv"] = _pad_heads_out(g(sa["v_proj"]["kernel"]), H, dh)
        packed[f"l{i}_bv"] = _pad_heads_out(g(sa["v_proj"]["bias"])[None],
                                            H, dh)
        packed[f"l{i}_wo"] = _pad_heads_in(g(sa["out_proj"]["kernel"]),
                                           H, dh)
        packed[f"l{i}_bo"] = g(sa["out_proj"]["bias"])[None]
        packed[f"l{i}_xwq"] = _pad_heads_out(
            g(ca["q_proj"]["kernel"]) * scale, H, dh)
        packed[f"l{i}_xbq"] = _pad_heads_out(
            g(ca["q_proj"]["bias"])[None] * scale, H, dh)
        packed[f"l{i}_xwo"] = _pad_heads_in(g(ca["out_proj"]["kernel"]),
                                            H, dh)
        packed[f"l{i}_xbo"] = g(ca["out_proj"]["bias"])[None]
        packed[f"l{i}_w1"] = g(lp["linear1"]["kernel"])
        packed[f"l{i}_b1"] = g(lp["linear1"]["bias"])[None]
        packed[f"l{i}_w2"] = g(lp["linear2"]["kernel"])
        packed[f"l{i}_b2"] = g(lp["linear2"]["bias"])[None]
        for j, norm in enumerate(("norm1", "norm2", "norm3"), 1):
            packed[f"l{i}_ln{j}"] = np.stack(
                [g(lp[norm]["scale"]), g(lp[norm]["bias"])])   # [2, E]
    return packed


# --------------------------------------------------------------------------
# Kernel
# --------------------------------------------------------------------------

def _ln(x, ln):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * ln[0:1, :] + ln[1:2, :]


def _mha_lanes(q, kcache, vcache, valid, nhead):
    """Per-head lane-block attention.

    q: [B, H*HPAD]; kcache/vcache: [T, B, H*HPAD] (possibly stored
    bf16 — cast per head block, accumulate f32); valid: [T, B] bool.
    -> ctx [B, H*HPAD].  Slice-then-expand only: mixing None with a
    slice in one indexing expression sends jnp down the gather path,
    which Mosaic cannot lower."""
    T = kcache.shape[0]
    ctxs = []
    neg = jnp.float32(-1e30)
    for h in range(nhead):
        sl = slice(h * HPAD, (h + 1) * HPAD)
        qh = q[:, sl]                                 # [B, HPAD]
        kh = kcache[:, :, sl].astype(jnp.float32)     # [T, B, HPAD]
        vh = vcache[:, :, sl].astype(jnp.float32)
        scores = jnp.sum(qh[None] * kh, axis=-1)          # [T, B]
        scores = jnp.where(valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        attn = e / jnp.sum(e, axis=0, keepdims=True)      # [T, B]
        ctxs.append(jnp.sum(attn[:, :, None] * vh, axis=0))   # [B, HPAD]
    return jnp.concatenate(ctxs, axis=-1)


def _make_kernel(nlayers: int, nhead: int, L: int, eos: int, pad: int,
                 v_real: int, emb_dim: int):
    import math
    sqrt_e = math.sqrt(emb_dim)

    def kernel(*refs):
        # ref order: memk(l)..., memv(l)..., mem_valid, weights...,
        # out_seq, scratch self_k(l), self_v(l)
        idx = 0
        memk = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        memv = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        mem_valid_ref = refs[idx]; idx += 1
        emb_in_ref = refs[idx]; idx += 1
        emb_out_ref = refs[idx]; idx += 1
        pe_ref = refs[idx]; idx += 1
        lw = []
        per_layer = 17
        for i in range(nlayers):
            lw.append([refs[idx + j] for j in range(per_layer)])
            idx += per_layer
        out_ref = refs[idx]; idx += 1
        self_k = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        self_v = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        pad_flag = refs[idx]; idx += 1                # [L, B] f32 scratch

        v_pad = emb_out_ref.shape[1]
        mem_valid = mem_valid_ref[:] > 0              # [S, B]

        def step(t, carry):
            word, finished = carry                    # [B,1] i32, [B,1] f32
            # embedding lookup via one-hot matmul
            lane = jax.lax.broadcasted_iota(jnp.int32, (word.shape[0],
                                                        v_pad), 1)
            onehot = (lane == word).astype(jnp.float32)
            x = jnp.dot(onehot, emb_in_ref[:],
                        preferred_element_type=jnp.float32) * sqrt_e
            x = x + pe_ref[pl.ds(t, 1), :]

            # record pad flag of the *input* token at position t
            pad_flag[pl.ds(t, 1), :] = jnp.transpose(
                (word == pad).astype(jnp.float32), (1, 0))
            row = jax.lax.broadcasted_iota(
                jnp.int32, (self_k[0].shape[0], x.shape[0]), 0)
            self_valid = (row <= t) & (pad_flag[:] < 0.5)

            for i in range(nlayers):
                (wq, bq, wk, bk, wv, bv, wo, bo, xwq, xbq, xwo, xbo,
                 w1, b1, w2, b2x, lns) = lw[i]
                ln1, ln2, ln3 = lns[0:2, :], lns[2:4, :], lns[4:6, :]
                q = jnp.dot(x, wq[:],
                            preferred_element_type=jnp.float32) + bq[:]
                k = jnp.dot(x, wk[:],
                            preferred_element_type=jnp.float32) + bk[:]
                v = jnp.dot(x, wv[:],
                            preferred_element_type=jnp.float32) + bv[:]
                self_k[i][pl.ds(t, 1), :, :] = k[None].astype(
                    self_k[i].dtype)
                self_v[i][pl.ds(t, 1), :, :] = v[None].astype(
                    self_v[i].dtype)
                ctx = _mha_lanes(q, self_k[i][:], self_v[i][:],
                                 self_valid, nhead)
                sa = jnp.dot(ctx, wo[:],
                             preferred_element_type=jnp.float32) + bo[:]
                x = _ln(x + sa, ln1)
                xq = jnp.dot(x, xwq[:],
                             preferred_element_type=jnp.float32) + xbq[:]
                xctx = _mha_lanes(xq, memk[i][:], memv[i][:], mem_valid,
                                  nhead)
                ca = jnp.dot(xctx, xwo[:],
                             preferred_element_type=jnp.float32) + xbo[:]
                x = _ln(x + ca, ln2)
                h = jnp.maximum(
                    jnp.dot(x, w1[:],
                            preferred_element_type=jnp.float32) + b1[:],
                    0.0)
                ff = jnp.dot(h, w2[:],
                             preferred_element_type=jnp.float32) + b2x[:]
                x = _ln(x + ff, ln3)

            logits = jnp.dot(x, emb_out_ref[:],
                             preferred_element_type=jnp.float32)
            lane_v = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(lane_v < v_real, logits, -1e9)
            new_word = jnp.argmax(logits, axis=-1,
                                  keepdims=True).astype(jnp.int32)
            out_word = jnp.where(finished > 0.5, jnp.int32(eos), new_word)
            finished = jnp.maximum(
                finished, (new_word == eos).astype(jnp.float32))
            out_ref[pl.ds(t, 1), :] = jnp.transpose(out_word, (1, 0))
            return (out_word, finished)

        B = out_ref.shape[1]
        # zero caches: garbage rows would poison context sums (0 * NaN)
        for i in range(nlayers):
            self_k[i][:] = jnp.zeros_like(self_k[i])
            self_v[i][:] = jnp.zeros_like(self_v[i])
        pad_flag[:] = jnp.zeros_like(pad_flag)
        word0 = jnp.ones((B, 1), jnp.int32)           # <bos>
        fin0 = jnp.zeros((B, 1), jnp.float32)
        jax.lax.fori_loop(0, L, step, (word0, fin0))

    return kernel


@functools.partial(jax.jit, static_argnames=("dec", "max_length",
                                             "cache_bf16"))
def _fused_decode_call(dec: TransformerDecoder, max_length: int,
                       packed: Dict[str, jnp.ndarray],
                       memk, memv, mem_valid,
                       cache_bf16: bool = False) -> jnp.ndarray:
    nlayers, nhead = dec.nlayers, dec._nhead
    B = memk[0].shape[1]
    L = max_length
    hp = nhead * HPAD
    special_eos, special_pad = 2, 0
    # bf16 serving story (mirrors fused_beam): the self-attention K/V
    # decode caches are *stored* bf16, halving their VMEM; every
    # attention read casts back to f32 and all accumulation stays f32.
    cache_dt = jnp.bfloat16 if cache_bf16 else jnp.float32

    kernel = _make_kernel(nlayers, nhead, L, special_eos, special_pad,
                          dec.vocab_size, dec.emb_dim)
    weight_keys = ["emb_in", "emb_out", "pe"]
    per_layer_keys = ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                      "xwq", "xbq", "xwo", "xbo", "w1", "b1", "w2", "b2",
                      "ln"]
    inputs = list(memk) + list(memv) + [mem_valid]
    inputs += [packed[k] for k in weight_keys]
    for i in range(nlayers):
        for k in per_layer_keys:
            key = f"l{i}_{k}" if k != "ln" else None
            if k == "ln":
                inputs.append(jnp.concatenate(
                    [packed[f"l{i}_ln1"], packed[f"l{i}_ln2"],
                     packed[f"l{i}_ln3"]], axis=0))
            else:
                inputs.append(packed[key])

    n_in = len(inputs)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, B), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM((L, B, hp), cache_dt)] * (2 * nlayers)
            + [pltpu.VMEM((L, B), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*inputs)
    return jnp.transpose(out, (1, 0))                 # [B, L]


class FusedGreedyDecoder:
    """Weight-packing + memory-precompute wrapper around the kernel.

    Usage:
        fd = FusedGreedyDecoder(model, variables)
        seq = fd(wav, wav_len)          # [B, max_length] token ids
    """

    def __init__(self, model: Captioner, variables: Dict,
                 max_length: int = 20, bake_params: bool = None,
                 max_kernel_batch: int = None,
                 cache_bf16: bool = None):
        self.model = model
        self.dec: TransformerDecoder = model.decoder
        # exact type: conditioned subclasses (Event/KeywordProb) inject
        # a per-step cond embedding the kernel does not model
        assert type(self.dec) is TransformerDecoder, (
            "fused decode supports the plain TransformerDecoder only; "
            f"got {type(self.dec).__name__}")
        # bf16 mem-K/V + decode-cache storage (f32 accumulate): halves
        # the dominant VMEM terms so the kernel chunk doubles to 256,
        # and halves the per-step cross-attention read bytes.  Defaults
        # on for bf16-compute models (the serving configuration),
        # mirroring FusedBeamDecoder.
        if cache_bf16 is None:
            cache_bf16 = self.dec.compute_dtype == jnp.bfloat16
        self.cache_bf16 = bool(cache_bf16)
        self._explicit_kernel_batch = max_kernel_batch
        self.variables = variables
        self.max_length = max_length
        packed = pack_decoder_weights(
            self.dec, jax.device_get(variables["params"]["decoder"]))
        self._packed = {k: jnp.asarray(v) for k, v in packed.items()}
        self._nhead = self.dec._nhead
        dh = self.dec.emb_dim // self._nhead

        dec = self.dec
        packed = self._packed
        model = self.model

        # ``variables`` handling is two-mode (bake_params):
        #   * baked (default for small models): the params are a jit
        #     CLOSURE, so XLA constant-folds them (folds BN scales /
        #     weight layouts at compile time — measurably faster);
        #   * traced (default above BAKE_LIMIT_BYTES): params are jit
        #     arguments, avoiding the axon remote-compile size limit
        #     (HTTP 413 on ~350 MB Cnn14Rnn constants).
        if bake_params is None:
            bake_params = _tree_bytes(variables) <= BAKE_LIMIT_BYTES
        self.bake_params = bool(bake_params)

        mem_dt = jnp.bfloat16 if self.cache_bf16 else jnp.float32

        def prepare(variables, wav, wav_len):
            dec_vars = {"params": variables["params"]["decoder"]}
            enc = model.apply(variables, wav, wav_len,
                              method=Captioner.encode)
            static, _ = dec.apply(dec_vars, enc["attn_emb"],
                                  enc["attn_emb_len"], max_length,
                                  method=TransformerDecoder.init_cache)
            memk, memv = [], []
            for i in range(dec.nlayers):
                mk = static[f"mem_k{i}"].astype(mem_dt)       # [B, S, E]
                mv = static[f"mem_v{i}"].astype(mem_dt)
                # head-pad: [B, S, E] -> [S, B, H*HPAD]
                def pad_heads(m):
                    m = jnp.transpose(m, (1, 0, 2))           # [S, B, E]
                    parts = []
                    for h in range(self._nhead):
                        blk = m[:, :, h * dh:(h + 1) * dh]
                        blk = jnp.pad(blk,
                                      ((0, 0), (0, 0), (0, HPAD - dh)))
                        parts.append(blk)
                    return jnp.concatenate(parts, axis=-1)
                memk.append(pad_heads(mk))
                memv.append(pad_heads(mv))
            mem_valid = jnp.transpose(
                ~static["mem_kpm"], (1, 0)).astype(jnp.float32)  # [S, B]
            return tuple(memk), tuple(memv), mem_valid

        cache_bf16_flag = self.cache_bf16

        def run(variables, wav, wav_len):
            memk, memv, mem_valid = prepare(variables, wav, wav_len)
            return _fused_decode_call(dec, max_length, packed,
                                      memk, memv, mem_valid,
                                      cache_bf16=cache_bf16_flag)

        if self.bake_params:
            self._prepare = jax.jit(functools.partial(prepare, variables))
            self._run = jax.jit(functools.partial(run, variables))
        else:
            prepare_v = jax.jit(prepare)
            self._prepare = lambda w, l: prepare_v(self.variables, w, l)
            run_v = jax.jit(run)
            self._run = lambda w, l: run_v(self.variables, w, l)
        # mem K/V live fully in VMEM: cap the kernel batch (f32 caches:
        # B=128 with S<=32 fits the ~100MB scoped VMEM, B=256 does not;
        # bf16 cache storage halves both VMEM terms so B=256 fits).
        # Long memories shrink this via the compile-failure fallback in
        # __call__ (see _COMPILE_FALLBACK_MARKERS); the shrunken chunk
        # is remembered per padded wav length in _chunk_for_frames, the
        # configured default below is never mutated.
        if max_kernel_batch is None:
            max_kernel_batch = 256 if self.cache_bf16 else 128
        self.max_kernel_batch = max_kernel_batch
        self._chunked_cache = {}
        self._chunk_for_frames: Dict[int, int] = {}

        def make_chunked(B, mb):
            # ONE jitted program for the whole batch, per-chunk
            # pipeline inside it.  Two measured facts (TPU v5e, B=256):
            # issuing chunks/slices as separate dispatches is
            # pathological over the high-latency axon tunnel (host
            # round-trip per tiny program), and the kernel chunk here
            # EQUALS the efficient encoder batch (128), so encoding the
            # whole batch at once is ~1 ms slower than two 128-clip
            # encoder passes (28.1 vs 27.3 ms e2e).
            def run_chunked(variables, w, wl):
                outs = []
                for i in range(0, B, mb):
                    end = min(i + mb, B)  # final chunk may be short
                    memk, memv, valid = prepare(
                        variables,
                        jax.lax.slice_in_dim(w, i, end, axis=0),
                        jax.lax.slice_in_dim(wl, i, end, axis=0))
                    outs.append(_fused_decode_call(
                        dec, max_length, packed, memk, memv, valid,
                        cache_bf16=cache_bf16_flag))
                return jnp.concatenate(outs, axis=0)

            if self.bake_params:
                return jax.jit(functools.partial(run_chunked, variables))
            chunked_v = jax.jit(run_chunked)
            return lambda w, wl: chunked_v(self.variables, w, wl)

        self._make_chunked = make_chunked

    def __call__(self, wav, wav_len) -> jnp.ndarray:
        B, T = wav.shape[0], wav.shape[1]
        chunk = self._chunk_for_frames.get(T, self.max_kernel_batch)
        while True:
            try:
                if B <= chunk:
                    out = self._run(wav, wav_len)
                else:
                    key = (B, chunk)
                    if key not in self._chunked_cache:
                        self._chunked_cache[key] = self._make_chunked(
                            B, chunk)
                    out = self._chunked_cache[key](wav, wav_len)
                self._chunk_for_frames[T] = chunk
                return out
            except Exception as e:
                half = chunk // 2
                # retry only when the halved chunk produces a DIFFERENT
                # program (half < B); otherwise re-running is the same
                # compile failing again
                if (self._explicit_kernel_batch is not None
                        or half < MIN_KERNEL_BATCH
                        or half >= B
                        or not _is_compile_resource_error(e)):
                    raise
                warnings.warn(
                    f"fused greedy: kernel chunk {chunk} failed to "
                    f"compile ({type(e).__name__}: {str(e)[:200]}); "
                    f"retrying with chunk {half} (long encoder memories "
                    "exceed the VMEM budget at the default chunk)")
                chunk = half
