"""Fully fused batched BEAM SEARCH: the entire beam-3 decode loop —
embedding, N transformer layers, vocab projection, per-sample top-K over
[K x V], parent-beam cache gather, done-beam harvest with length
normalization and the -1000 ended-beam penalty — inside ONE Pallas
kernel with weights pinned in VMEM.

Beam is the reference's default decode (base.py:88-98: sample_method
beam, beam_size 3), so it must be kernel-fast, not just the greedy path.
Semantics are token-identical to decoding.engine.beam_search (itself
parity-tested token-for-token against the reference's per-sample Python
beam search, base.py:254-325) for temp == 1.0.

Layout decisions (Mosaic-friendly; see fused_greedy.py for the shared
tricks — lane-padded heads, folded 1/sqrt(dh), one-hot embedding):

  * rows are BEAM-MAJOR: row k*B + b is (beam k, sample b), so "all rows
    of beam k" is a contiguous static sublane slice [k*B, (k+1)*B) —
    per-beam math never needs strided gathers;
  * cross-attention K/V are stored ONCE per sample [S, B, H*HPAD] and
    reused by every beam (the XLA engine materializes B*K copies);
  * top-K over the virtual [K*V] axis is hierarchical: per-beam lane
    max/argmax, then an unrolled strict-> select over beams, repeated K
    times with the picked entry masked out.  Strict > keeps lax.top_k's
    lower-flat-index tie-breaking (beam-major flat index = k*V + word);
  * the parent-beam gather of the self-attention caches / sequences /
    pad flags is K^2 masked selects over contiguous beam slices (K = 3,
    so 9 selects) — no dynamic sublane gathers.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import warnings

from audiocaption_tpu.decoding.fused_greedy import (
    HPAD, MIN_KERNEL_BATCH, _is_compile_resource_error, _tree_bytes,
    BAKE_LIMIT_BYTES, pack_decoder_weights)
from audiocaption_tpu.models.captioner import Captioner
from audiocaption_tpu.models.transformer_decoder import TransformerDecoder

NEG = -3.0e38                       # engine NEG_INF (finfo.min) stand-in


def _ln(x, ln):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * ln[0:1, :] + ln[1:2, :]


def _dot(x, w):
    """Matmul against a possibly-bf16-stored weight, f32 accumulate.

    In the bf16 serving story the large weight matrices are stored bf16
    (halving their VMEM and running the MXU at its bf16 rate — the dots
    are the beam step's FLOPs); activations are cast to the weight
    dtype at the dot boundary only, every accumulation stays f32."""
    return jnp.dot(x.astype(w.dtype), w,
                   preferred_element_type=jnp.float32)


def _mha_lanes(q, kcache, vcache, valid, nhead):
    """q: [N, H*HPAD]; kcache/vcache: [T, N, H*HPAD]; valid: [T, N].

    K/V caches may be stored bf16 (halving their VMEM so the kernel
    batch can double); scores/attention always accumulate in f32.

    NOTE: slice-then-expand (`q[:, sl][None]`, never `q[None, :, sl]`):
    mixing None with a slice sends jnp indexing down the gather path,
    which Mosaic cannot lower."""
    ctxs = []
    neg = jnp.float32(-1e30)
    for h in range(nhead):
        sl = slice(h * HPAD, (h + 1) * HPAD)
        qh = q[:, sl]
        kh = kcache[:, :, sl].astype(jnp.float32)
        vh = vcache[:, :, sl].astype(jnp.float32)
        scores = jnp.sum(qh[None] * kh, axis=-1)
        scores = jnp.where(valid, scores, neg)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        attn = e / jnp.sum(e, axis=0, keepdims=True)
        ctxs.append(jnp.sum(attn[:, :, None] * vh, axis=0))
    return jnp.concatenate(ctxs, axis=-1)


def _cross_mha_beams(xq, kcache, vcache, valid, nhead, K, B):
    """Cross attention of K beams against ONE shared per-sample memory.

    xq: [K*B, H*HPAD] beam-major queries; kcache/vcache: [S, B, H*HPAD]
    memory stored once per sample; valid: [S, B].

    Loads each head's K/V slice ONCE and reuses it for all K beam query
    slices — calling :func:`_mha_lanes` per beam re-reads the whole
    memory K times, and those loads are the dominant VMEM traffic of a
    beam step (S x B x H*HPAD per head per beam).  Math is identical
    per beam (same f32 accumulation order), so tokens don't move.
    Returns [K*B, H*HPAD] beam-major contexts.
    """
    neg = jnp.float32(-1e30)
    per_beam_ctxs = [[] for _ in range(K)]      # [beam][head]
    for h in range(nhead):
        sl = slice(h * HPAD, (h + 1) * HPAD)
        kh = kcache[:, :, sl].astype(jnp.float32)
        vh = vcache[:, :, sl].astype(jnp.float32)
        for kb in range(K):
            qh = xq[kb * B:(kb + 1) * B, sl]
            scores = jnp.sum(qh[None] * kh, axis=-1)
            scores = jnp.where(valid, scores, neg)
            m = jnp.max(scores, axis=0, keepdims=True)
            e = jnp.exp(scores - m)
            attn = e / jnp.sum(e, axis=0, keepdims=True)
            per_beam_ctxs[kb].append(jnp.sum(attn[:, :, None] * vh,
                                             axis=0))
    return jnp.concatenate(
        [jnp.concatenate(c, axis=-1) for c in per_beam_ctxs], axis=0)


def _make_beam_kernel(nlayers: int, nhead: int, L: int, K: int, B: int,
                      eos: int, pad: int, v_real: int, emb_dim: int):
    import math
    sqrt_e = math.sqrt(emb_dim)

    def kernel(*refs):
        idx = 0
        memk = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        memv = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        mem_valid_ref = refs[idx]; idx += 1               # [S, B] f32
        emb_in_ref = refs[idx]; idx += 1
        emb_out_ref = refs[idx]; idx += 1
        pe_ref = refs[idx]; idx += 1
        lw = []
        per_layer = 17
        for i in range(nlayers):
            lw.append([refs[idx + j] for j in range(per_layer)])
            idx += per_layer
        out_seq = refs[idx]; idx += 1                     # [L, K*B] i32
        out_score = refs[idx]; idx += 1                   # [K8, B] f32
        self_k = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        self_v = [refs[idx + i] for i in range(nlayers)]; idx += nlayers
        pad_flag = refs[idx]; idx += 1                    # [L, K*B] f32
        seq_ref = refs[idx]; idx += 1                     # [L, K*B] i32

        v_pad = emb_out_ref.shape[1]
        mem_valid1 = mem_valid_ref[:] > 0                 # [S, B]

        def bsl(k):
            return slice(k * B, (k + 1) * B)

        def step(t, carry):
            # word [K*B, 1] i32; topk_lp/done [K8, B]; done_count/stopped
            # [1, B] f32
            word, topk_lp, done_count, stopped = carry

            lane = jax.lax.broadcasted_iota(jnp.int32, (K * B, v_pad), 1)
            onehot = (lane == word).astype(jnp.float32)
            x = _dot(onehot, emb_in_ref[:]) * sqrt_e
            x = x + pe_ref[pl.ds(t, 1), :]

            pad_flag[pl.ds(t, 1), :] = jnp.transpose(
                (word == pad).astype(jnp.float32), (1, 0))
            row = jax.lax.broadcasted_iota(
                jnp.int32, (self_k[0].shape[0], K * B), 0)
            self_valid = (row <= t) & (pad_flag[:] < 0.5)

            for i in range(nlayers):
                (wq, bq, wk, bk, wv, bv, wo, bo, xwq, xbq, xwo, xbo,
                 w1, b1, w2, b2x, lns) = lw[i]
                ln1, ln2, ln3 = lns[0:2, :], lns[2:4, :], lns[4:6, :]
                q = _dot(x, wq[:]) + bq[:]
                k = _dot(x, wk[:]) + bk[:]
                v = _dot(x, wv[:]) + bv[:]
                self_k[i][pl.ds(t, 1), :, :] = k[None].astype(
                    self_k[i].dtype)
                self_v[i][pl.ds(t, 1), :, :] = v[None].astype(
                    self_v[i].dtype)
                ctx = _mha_lanes(q, self_k[i][:], self_v[i][:],
                                 self_valid, nhead)
                sa = _dot(ctx, wo[:]) + bo[:]
                x = _ln(x + sa, ln1)
                xq = _dot(x, xwq[:]) + xbq[:]
                # cross attention: mem K/V stored once per sample and
                # loaded once per head (not once per beam)
                xctx = _cross_mha_beams(xq, memk[i][:], memv[i][:],
                                        mem_valid1, nhead, K, B)
                ca = _dot(xctx, xwo[:]) + xbo[:]
                x = _ln(x + ca, ln2)
                h = jnp.maximum(_dot(x, w1[:]) + b1[:], 0.0)
                ff = _dot(h, w2[:]) + b2x[:]
                x = _ln(x + ff, ln3)

            logits = _dot(x, emb_out_ref[:])
            lane_v = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
            logits = jnp.where(lane_v < v_real, logits, -1e9)
            # log-softmax (engine applies it twice with /temp; for
            # temp == 1 the second application is the identity)
            m = jnp.max(logits, axis=-1, keepdims=True)
            lp = logits - m - jnp.log(
                jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))

            # NOTE all small per-sample vectors are kept 2-D [B, 1]
            # (Mosaic has no stable lowering for 1-D intermediates).

            # total scores per beam: [B, v_pad] each
            totals = []
            for kb in range(K):
                tot = lp[bsl(kb)] + jnp.transpose(
                    topk_lp[kb:kb + 1, :], (1, 0))
                # t == 0: all beams identical -> only beam 0 competes
                if kb > 0:
                    tot = jnp.where(jnp.equal(t, 0), NEG, tot)
                totals.append(tot)

            # hierarchical top-K over the virtual [K*V] axis
            new_lp_l, prev_beam_l, new_word_l = [], [], []
            lane_b = jax.lax.broadcasted_iota(jnp.int32, (B, v_pad), 1)
            for _sel in range(K):
                per_max = [jnp.max(tk, axis=-1, keepdims=True)
                           for tk in totals]                  # [B, 1]
                per_arg = [jnp.argmax(tk, axis=-1,
                                      keepdims=True).astype(jnp.int32)
                           for tk in totals]                  # [B, 1]
                best = per_max[0]
                best_beam = jnp.zeros_like(per_arg[0])
                best_word = per_arg[0]
                for j in range(1, K):
                    better = per_max[j] > best
                    best = jnp.where(better, per_max[j], best)
                    best_beam = jnp.where(better, j, best_beam)
                    best_word = jnp.where(better, per_arg[j], best_word)
                new_lp_l.append(best)
                prev_beam_l.append(best_beam)
                new_word_l.append(best_word)
                # mask the picked entry out
                for j in range(K):
                    hit = (best_beam == j) & (lane_b == best_word)
                    totals[j] = jnp.where(hit, NEG, totals[j])

            # [B, 1] -> [1, B] row masks for the gathers below
            pb_row = [jnp.transpose(pb, (1, 0)) for pb in prev_beam_l]
            word_row = [jnp.transpose(w, (1, 0)) for w in new_word_l]

            # ---- parent-beam gather ----
            # Each ref is permuted with ONE hoisted read per source beam
            # (the loads are values before any store, so in-place
            # permutation is safe) and K masked selects per target.
            # Masks are cast to f32 BEFORE any rank change: Mosaic
            # cannot reshape i1 vectors ([1,B] bool -> [1,B,1] fails to
            # lower).
            def permute_ref(ref, rows, extra_dim):
                if extra_dim:
                    srcs = [ref[rows, bsl(j), :] for j in range(K)]
                else:
                    srcs = [ref[rows, bsl(j)] for j in range(K)]
                for kt in range(K):
                    acc = srcs[0]
                    for j in range(1, K):
                        mjf = (pb_row[kt] == j).astype(jnp.float32)
                        if extra_dim:
                            mj = mjf[:, :, None] > 0.5    # [1, B, 1]
                        else:
                            mj = mjf > 0.5                # [1, B]
                        acc = jnp.where(mj, srcs[j], acc)
                    if extra_dim:
                        ref[rows, bsl(kt), :] = acc
                    else:
                        ref[rows, bsl(kt)] = acc

            # Rows > t are identical across beams (caches: zeros; seq:
            # eos; pad flags: zeros — each row is first written at its
            # own step), so permuting them is a no-op: row-blocks whose
            # first row exceeds t are skipped.  This cuts the dominant
            # per-step VMEM traffic from L rows to ~t+1.
            RB = 8
            for lo in range(0, L, RB):
                hi = min(lo + RB, L)
                rows = slice(lo, hi)

                def permute_all(rows=rows):
                    permute_ref(seq_ref, rows, False)
                    permute_ref(pad_flag, rows, False)
                    for i in range(nlayers):
                        permute_ref(self_k[i], rows, True)
                        permute_ref(self_v[i], rows, True)

                if lo == 0:
                    permute_all()
                else:
                    pl.when(t >= lo)(permute_all)
            # append the new word at t AFTER the prefix gather.  The
            # row-t write covers ALL lanes at once — a dynamic-sublane
            # store to a partial lane slice is "dynamic store with
            # unaligned indices" in Mosaic.
            seq_ref[pl.ds(t, 1), :] = jnp.concatenate(word_row, axis=1)

            # ---- done-beam harvest (engine _merge_done semantics) ----
            last_t = jnp.equal(t, L - 1)
            inv_len = 1.0 / (t + 1).astype(jnp.float32)
            stopped_col = jnp.transpose(stopped, (1, 0))   # [B, 1]
            is_end_l, cand_l = [], []
            for kt in range(K):
                ie = (new_word_l[kt] == eos) | last_t      # [B, 1]
                hv = ie & (stopped_col < 0.5)
                is_end_l.append(ie)
                cand_l.append(jnp.where(hv, new_lp_l[kt] * inv_len, NEG))

            # stable top-K over [old done (K) || candidates (K)];
            # all score vectors in [B, 1] column form
            srcs = [jnp.transpose(out_score[s:s + 1, :], (1, 0))
                    for s in range(K)] + cand_l
            chosen = [jnp.zeros((B, 1), bool) for _ in range(2 * K)]
            slot_best_src = []
            slot_best_score = []
            for _slot in range(K):
                best = jnp.full((B, 1), NEG)
                best_src = jnp.zeros((B, 1), jnp.int32)
                for si in range(2 * K):
                    cand = jnp.where(chosen[si], NEG, srcs[si])
                    better = cand > best
                    best = jnp.where(better, cand, best)
                    best_src = jnp.where(better, si, best_src)
                slot_best_src.append(jnp.transpose(best_src, (1, 0)))
                slot_best_score.append(jnp.transpose(best, (1, 0)))
                for si in range(2 * K):
                    chosen[si] = chosen[si] | (best_src == si)

            # assemble new done seqs BEFORE overwriting out_seq
            def done_src_seq(si):
                if si < K:
                    return out_seq[:, bsl(si)]
                return seq_ref[:, bsl(si - K)]

            new_done_seqs = []
            for slot in range(K):
                src_id = slot_best_src[slot]               # [1, B]
                acc = done_src_seq(0)
                for si in range(1, 2 * K):
                    acc = jnp.where(src_id == si, done_src_seq(si), acc)
                new_done_seqs.append(acc)
            for slot in range(K):
                out_seq[:, bsl(slot)] = new_done_seqs[slot]
                out_score[slot:slot + 1, :] = slot_best_score[slot]

            n_harvest = sum(
                (cand_l[kt] > NEG / 2).astype(jnp.float32)
                for kt in range(K))                        # [B, 1]
            done_count = done_count + jnp.transpose(n_harvest, (1, 0))
            stopped = jnp.maximum(
                stopped, (done_count >= K).astype(jnp.float32))

            # next input word (beam-major rows) + next beam scores
            word_next = jnp.concatenate(new_word_l, axis=0)  # [K*B, 1]
            lp_rows = []
            for kt in range(K):
                nl = jnp.where(is_end_l[kt], new_lp_l[kt] - 1000.0,
                               new_lp_l[kt])
                lp_rows.append(jnp.transpose(nl, (1, 0)))
            topk_pad = jnp.concatenate(
                lp_rows + [jnp.zeros((topk_lp.shape[0] - K, B))], axis=0)
            return (word_next, topk_pad, done_count, stopped)

        for i in range(nlayers):
            self_k[i][:] = jnp.zeros_like(self_k[i])
            self_v[i][:] = jnp.zeros_like(self_v[i])
        pad_flag[:] = jnp.zeros_like(pad_flag)
        seq_ref[:] = jnp.full_like(seq_ref, eos)
        out_seq[:] = jnp.full_like(out_seq, eos)
        out_score[:] = jnp.full_like(out_score, NEG)

        K8 = out_score.shape[0]
        word0 = jnp.ones((K * B, 1), jnp.int32)           # <bos>
        lp0 = jnp.zeros((K8, B), jnp.float32)
        dc0 = jnp.zeros((1, B), jnp.float32)
        st0 = jnp.zeros((1, B), jnp.float32)
        jax.lax.fori_loop(0, L, step, (word0, lp0, dc0, st0))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("dec", "max_length", "beam_size",
                                    "cache_bf16", "weights_bf16"))
def _fused_beam_call(dec: TransformerDecoder, max_length: int,
                     beam_size: int, packed: Dict[str, jnp.ndarray],
                     memk, memv, mem_valid, cache_bf16: bool = False,
                     weights_bf16: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    nlayers, nhead = dec.nlayers, dec._nhead
    B = memk[0].shape[1]
    K, L = beam_size, max_length
    hp = nhead * HPAD
    K8 = 8                                               # sublane-padded K
    cache_dt = jnp.bfloat16 if cache_bf16 else jnp.float32

    kernel = _make_beam_kernel(nlayers, nhead, L, K, B, 2, 0,
                               dec.vocab_size, dec.emb_dim)
    # bf16 serving story: the large matmul weights are stored bf16 so
    # the step's dots run at the MXU bf16 rate (biases, LN params and
    # the PE table stay f32; all accumulation stays f32 via _dot)
    _BF16_KEYS = {"emb_in", "emb_out", "wq", "wk", "wv", "wo",
                  "xwq", "xwo", "w1", "w2"}

    def as_weight(key, arr):
        if weights_bf16 and key in _BF16_KEYS:
            return arr.astype(jnp.bfloat16)
        return arr

    weight_keys = ["emb_in", "emb_out", "pe"]
    inputs = list(memk) + list(memv) + [mem_valid]
    inputs += [as_weight(k, packed[k]) for k in weight_keys]
    for i in range(nlayers):
        for k in ["wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                  "xwq", "xbq", "xwo", "xbo", "w1", "b1", "w2", "b2",
                  "ln"]:
            if k == "ln":
                inputs.append(jnp.concatenate(
                    [packed[f"l{i}_ln1"], packed[f"l{i}_ln2"],
                     packed[f"l{i}_ln3"]], axis=0))
            else:
                inputs.append(as_weight(k, packed[f"l{i}_{k}"]))

    n_in = len(inputs)
    out_seq, out_score = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((L, K * B), jnp.int32),
                   jax.ShapeDtypeStruct((K8, B), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=(
            [pltpu.VMEM((L, K * B, hp), cache_dt)] * (2 * nlayers)
            + [pltpu.VMEM((L, K * B), jnp.float32),
               pltpu.VMEM((L, K * B), jnp.int32)]),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(*inputs)
    # [L, K*B] -> [B, K, L]; beam-major rows k*B+b
    seq = jnp.transpose(out_seq.reshape(L, K, B), (2, 1, 0))
    score = jnp.transpose(out_score[:K], (1, 0))          # [B, K]
    return seq, score


class FusedBeamDecoder:
    """Whole-loop fused beam search (default beam_size 3, base.py:88-98).

    Usage:
        fb = FusedBeamDecoder(model, variables, beam_size=3)
        seq = fb(wav, wav_len)              # [B, max_length], best beam
        seq, score = fb(wav, wav_len, n_best=True)   # [B, K, L], [B, K]
    """

    def __init__(self, model: Captioner, variables: Dict,
                 max_length: int = 20, beam_size: int = 3,
                 max_kernel_batch: int = None,
                 cache_bf16: bool = None,
                 weights_bf16: bool = None,
                 bake_params: bool = None):
        self.model = model
        self.dec: TransformerDecoder = model.decoder
        # exact type: conditioned subclasses (Event/KeywordProb) inject
        # a per-step cond embedding the kernel does not model
        assert type(self.dec) is TransformerDecoder, (
            "fused decode supports the plain TransformerDecoder only; "
            f"got {type(self.dec).__name__}")
        self.max_length = max_length
        self.beam_size = beam_size
        # bf16 K/V cache storage (f32 accumulate) halves the dominant
        # VMEM term, letting the kernel batch double.  Default: follow
        # the model's compute dtype, so bf16 serving models use bf16
        # caches (matching the XLA engine, which also stores bf16 K/V)
        # while f32 models keep exact-f32 caches.
        if cache_bf16 is None:
            cache_bf16 = self.dec.compute_dtype == jnp.bfloat16
        self.cache_bf16 = bool(cache_bf16)
        # bf16 weight storage is available but OFF by default: measured
        # on chip (B=256, trained flagship) it is ~14% SLOWER than f32
        # weights — the per-dot activation casts cost more than the
        # bf16 MXU rate saves at these small row counts (PERF.md).
        self.weights_bf16 = bool(weights_bf16) if weights_bf16 else False
        self._explicit_kernel_batch = max_kernel_batch
        if max_kernel_batch is None:
            max_kernel_batch = 128 if self.cache_bf16 else 64
        self.max_kernel_batch = max_kernel_batch
        packed = pack_decoder_weights(
            self.dec, jax.device_get(variables["params"]["decoder"]))
        self._packed = {k: jnp.asarray(v) for k, v in packed.items()}
        nhead = self.dec._nhead
        dh = self.dec.emb_dim // nhead
        dec = self.dec
        self.variables = variables
        packed_j = self._packed

        # ``variables`` handling is two-mode (bake_params), exactly as
        # in FusedGreedyDecoder: small models close over the params so
        # XLA constant-folds them; large models (Cnn14Rnn ~350 MB f32)
        # keep them as traced jit arguments to stay under the axon
        # remote-compile request limit (HTTP 413).
        if bake_params is None:
            bake_params = _tree_bytes(variables) <= BAKE_LIMIT_BYTES
        self.bake_params = bool(bake_params)

        def prepare(variables, wav, wav_len):
            dec_vars = {"params": variables["params"]["decoder"]}
            enc = model.apply(variables, wav, wav_len,
                              method=Captioner.encode)
            static, _ = dec.apply(dec_vars, enc["attn_emb"],
                                  enc["attn_emb_len"], max_length,
                                  method=TransformerDecoder.init_cache)
            memk, memv = [], []

            def pad_heads(m):                              # [B, S, E]
                m = jnp.transpose(m, (1, 0, 2))            # [S, B, E]
                parts = []
                for h in range(nhead):
                    blk = m[:, :, h * dh:(h + 1) * dh]
                    parts.append(jnp.pad(
                        blk, ((0, 0), (0, 0), (0, HPAD - dh))))
                return jnp.concatenate(parts, axis=-1)

            mem_dt = jnp.bfloat16 if self.cache_bf16 else jnp.float32
            for i in range(dec.nlayers):
                memk.append(pad_heads(static[f"mem_k{i}"].astype(mem_dt)))
                memv.append(pad_heads(static[f"mem_v{i}"].astype(mem_dt)))
            mem_valid = jnp.transpose(
                ~static["mem_kpm"], (1, 0)).astype(jnp.float32)
            return tuple(memk), tuple(memv), mem_valid

        cache_bf16 = self.cache_bf16
        weights_bf16 = self.weights_bf16

        def run(variables, wav, wav_len):
            memk, memv, mem_valid = prepare(variables, wav, wav_len)
            return _fused_beam_call(dec, max_length, beam_size, packed_j,
                                    memk, memv, mem_valid,
                                    cache_bf16=cache_bf16,
                                    weights_bf16=weights_bf16)

        if self.bake_params:
            self._prepare = jax.jit(functools.partial(prepare, variables))
            self._run = jax.jit(functools.partial(run, variables))
        else:
            prepare_v = jax.jit(prepare)
            self._prepare = lambda w, l: prepare_v(self.variables, w, l)
            run_v = jax.jit(run)
            self._run = lambda w, l: run_v(self.variables, w, l)
        self._chunked_cache = {}
        self._chunk_for_frames: Dict[int, int] = {}

        def make_chunked(B, mb):
            # ONE jitted program: encode the full batch once (the
            # encoder is ~2x more efficient at B=128 than 2x64), then
            # invoke the VMEM-capped kernel per memory slice inside the
            # same jit — piecewise dispatch of the slices is a
            # host-round-trip storm over the axon tunnel.
            def run_chunked(variables, w, wl):
                memk, memv, mem_valid = prepare(variables, w, wl)
                seqs, scores = [], []
                for i in range(0, B, mb):
                    end = min(i + mb, B)  # final chunk may be short
                    mk = tuple(jax.lax.slice_in_dim(m, i, end, axis=1)
                               for m in memk)
                    mv = tuple(jax.lax.slice_in_dim(m, i, end, axis=1)
                               for m in memv)
                    valid = jax.lax.slice_in_dim(mem_valid, i, end,
                                                 axis=1)
                    s, sc = _fused_beam_call(dec, max_length, beam_size,
                                             packed_j, mk, mv, valid,
                                             cache_bf16=cache_bf16,
                                             weights_bf16=weights_bf16)
                    seqs.append(s)
                    scores.append(sc)
                return (jnp.concatenate(seqs, axis=0),
                        jnp.concatenate(scores, axis=0))

            if self.bake_params:
                return jax.jit(functools.partial(run_chunked, variables))
            chunked_v = jax.jit(run_chunked)
            return lambda w, wl: chunked_v(self.variables, w, wl)

        self._make_chunked = make_chunked

    def __call__(self, wav, wav_len, n_best: bool = False):
        B, T = wav.shape[0], wav.shape[1]
        chunk = self._chunk_for_frames.get(T, self.max_kernel_batch)
        while True:
            try:
                if B <= chunk:
                    seq, score = self._run(wav, wav_len)
                else:
                    key = (B, chunk)
                    if key not in self._chunked_cache:
                        self._chunked_cache[key] = self._make_chunked(
                            B, chunk)
                    seq, score = self._chunked_cache[key](wav, wav_len)
                self._chunk_for_frames[T] = chunk
                break
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
                    f"fused beam: kernel chunk {chunk} failed to "
                    f"compile ({type(e).__name__}: {str(e)[:200]}); "
                    f"retrying with chunk {half} (long encoder memories "
                    "exceed the VMEM budget at the default chunk)")
                chunk = half
        if n_best:
            return seq, score
        return seq[:, 0]
