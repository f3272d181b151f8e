"""Fused greedy-decode kernel: weight-packing math and interpret-mode
token parity vs the XLA decoding engine.  (TPU-compiled parity is
checked in the bench path: 0/1280 token mismatches at B=64, V=4981.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


@pytest.fixture()
def interp(monkeypatch):
    import audiocaption_tpu.decoding.fused_greedy as FG
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(FG.pl, "pallas_call", patched)
    FG._fused_decode_call._clear_cache()
    yield FG
    FG._fused_decode_call._clear_cache()


def _small_model():
    from audiocaption_tpu.models.zoo import effb2_trm
    model = effb2_trm(vocab_size=60)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16000)), jnp.asarray([16000]),
        jnp.ones((1, 4), jnp.int32), jnp.asarray([4]), train=False)
    # jitter so the greedy trajectory is model-dependent
    import jax.tree_util as tu
    rng = np.random.RandomState(11)
    p = jax.device_get(variables["params"])
    p["decoder"] = tu.tree_map(
        lambda x: np.asarray(x) +
        rng.randn(*np.shape(x)).astype(np.float32) * 0.3, p["decoder"])
    return model, {"params": p, "batch_stats": variables["batch_stats"]}


def test_packed_weights_one_step_logits():
    """Packed/padded weights reproduce the decoder step logits exactly."""
    import math
    from audiocaption_tpu.decoding.fused_greedy import (
        HPAD, pack_decoder_weights)
    from audiocaption_tpu.models.captioner import Captioner
    from audiocaption_tpu.models.transformer_decoder import (
        TransformerDecoder)
    model, variables = _small_model()
    dec = model.decoder
    dec_vars = {"params": variables["params"]["decoder"]}
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000])
    enc = model.apply(variables, wav, lens, method=Captioner.encode)
    static, dyn = dec.apply(dec_vars, enc["attn_emb"],
                            enc["attn_emb_len"], 8,
                            method=TransformerDecoder.init_cache)
    word = jnp.ones((2,), jnp.int32)
    ref_logit, _ = dec.apply(dec_vars, word, jnp.int32(0), static, dyn,
                             method=TransformerDecoder.step)

    packed = pack_decoder_weights(
        dec, jax.device_get(variables["params"]["decoder"]))
    H, dh, E = dec._nhead, dec.emb_dim // dec._nhead, dec.emb_dim

    def pad_heads(m):
        m = jnp.transpose(m, (1, 0, 2))
        return jnp.concatenate(
            [jnp.pad(m[:, :, h * dh:(h + 1) * dh],
                     ((0, 0), (0, 0), (0, HPAD - dh))) for h in range(H)],
            axis=-1)

    def mha(q, K, V, valid):
        ctxs = []
        for h in range(H):
            sl = slice(h * HPAD, (h + 1) * HPAD)
            s = jnp.sum(q[None, :, sl] * K[:, :, sl], -1)
            s = jnp.where(valid, s, -1e30)
            a = jax.nn.softmax(s, axis=0)
            ctxs.append(jnp.sum(a[:, :, None] * V[:, :, sl], 0))
        return jnp.concatenate(ctxs, -1)

    def ln(x, p):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + 1e-5) * p[0:1] + p[1:2]

    pk = {k: jnp.asarray(v) for k, v in packed.items()}
    memk = [pad_heads(static[f"mem_k{i}"].astype(jnp.float32))
            for i in range(dec.nlayers)]
    memv = [pad_heads(static[f"mem_v{i}"].astype(jnp.float32))
            for i in range(dec.nlayers)]
    mem_valid = jnp.transpose(~static["mem_kpm"], (1, 0))

    onehot = jax.nn.one_hot(word, pk["emb_in"].shape[0])
    x = onehot @ pk["emb_in"] * math.sqrt(E) + pk["pe"][0:1]
    for i in range(dec.nlayers):
        g = lambda k: pk[f"l{i}_{k}"]
        q = x @ g("wq") + g("bq")
        k = x @ g("wk") + g("bk")
        v = x @ g("wv") + g("bv")
        ctx = mha(q, k[None], v[None], jnp.ones((1, 2), bool))
        x = ln(x + ctx @ g("wo") + g("bo"), g("ln1"))
        xq = x @ g("xwq") + g("xbq")
        ca = mha(xq, memk[i], memv[i], mem_valid) @ g("xwo") + g("xbo")
        x = ln(x + ca, g("ln2"))
        h = jnp.maximum(x @ g("w1") + g("b1"), 0)
        x = ln(x + h @ g("w2") + g("b2"), g("ln3"))
    logits = np.asarray(x @ pk["emb_out"])[:, :dec.vocab_size]
    np.testing.assert_allclose(logits, np.asarray(ref_logit), atol=2e-5)


def test_fused_kernel_interpret_token_parity(interp):
    from audiocaption_tpu.models.captioner import generate
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(0).randn(3, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000])
    ref = np.asarray(generate(model, variables, wav, lens,
                              sample_method="greedy", max_length=10)["seq"])
    fd = interp.FusedGreedyDecoder(model, variables, max_length=10)
    got = np.asarray(fd(wav, lens))
    np.testing.assert_array_equal(got, ref)


def test_fused_kernel_chunked_parity(interp):
    """B > max_kernel_batch, B NOT a multiple of it (regression: the
    unclamped slice raised at trace time): the chunked path must match
    the whole-batch engine decode token-for-token."""
    from audiocaption_tpu.models.captioner import generate
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(1).randn(5, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000, 7000, 15000])
    ref = np.asarray(generate(model, variables, wav, lens,
                              sample_method="greedy", max_length=8)["seq"])
    fd = interp.FusedGreedyDecoder(model, variables, max_length=8)
    fd.max_kernel_batch = 2
    got = np.asarray(fd(wav, lens))
    np.testing.assert_array_equal(got, ref)


def test_fused_greedy_bf16_cache_token_parity(interp):
    """bf16 mem-K/V + decode-cache storage (the serving configuration:
    halves the dominant VMEM terms, doubles the kernel chunk to 256,
    halves the per-step cross-attention read bytes) with f32
    accumulate: token-identical to the engine on a well-separated
    model."""
    from audiocaption_tpu.models.captioner import generate
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(3).randn(3, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000])
    ref = np.asarray(generate(model, variables, wav, lens,
                              sample_method="greedy", max_length=8)["seq"])
    fd = interp.FusedGreedyDecoder(model, variables, max_length=8,
                                   cache_bf16=True)
    assert fd.max_kernel_batch == 256
    np.testing.assert_array_equal(np.asarray(fd(wav, lens)), ref)
    # f32 model default stays f32 caches / chunk 128
    fd32 = interp.FusedGreedyDecoder(model, variables, max_length=8)
    assert not fd32.cache_bf16 and fd32.max_kernel_batch == 128


def test_bake_params_modes_token_identical(interp):
    """bake_params=True (params closed over / constant-folded) and
    bake_params=False (params as traced jit args, the >BAKE_LIMIT_BYTES
    fallback for checkpoints too big for the remote-compile request)
    must produce identical tokens; the small-model default is baked."""
    model, variables = _small_model()
    wav = jnp.asarray(np.random.RandomState(2).randn(3, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000])
    fd_auto = interp.FusedGreedyDecoder(model, variables, max_length=8)
    assert fd_auto.bake_params            # small model -> baked default
    fd_traced = interp.FusedGreedyDecoder(model, variables, max_length=8,
                                          bake_params=False)
    np.testing.assert_array_equal(np.asarray(fd_auto(wav, lens)),
                                  np.asarray(fd_traced(wav, lens)))


def test_compile_failure_fallback_halves_chunk(interp, monkeypatch):
    """Long-memory encoders can exceed the kernel's VMEM budget at the
    default chunk, surfacing as a Mosaic/remote-compile failure; the
    decoder must halve the chunk and retry — but ONLY when the halved
    chunk actually changes the compiled program (measured on chip: the
    Cdur5 student's S=250 memory fails to compile fused beam at chunk
    128 but runs at 64)."""
    from audiocaption_tpu.decoding import fused_greedy as fg
    model, variables = _small_model()
    fd = interp.FusedGreedyDecoder(model, variables, max_length=6)
    wav = jnp.asarray(np.random.RandomState(2).randn(4, 16000),
                      jnp.float32)
    lens = jnp.asarray([16000, 9000, 12000, 7000])
    want = np.asarray(fd(wav, lens))

    calls = {"n": 0}

    def failing_run(w, l):
        calls["n"] += 1
        raise RuntimeError(
            "Mosaic failed: http://127.0.0.1:1/remote_compile: HTTP "
            "500: tpu_compile_helper subprocess exit code 1")

    # (a) B=4 at chunk 128: halving to 64 would re-run the IDENTICAL
    # whole-batch program (64 >= B), so the error must propagate after
    # exactly ONE attempt — no pointless recompile cycles.
    fd._run = failing_run
    fd._chunk_for_frames.clear()
    with pytest.raises(RuntimeError, match="remote_compile"):
        fd(wav, lens)
    assert calls["n"] == 1
    assert fd.max_kernel_batch == 128          # default never mutated

    # (b) a genuine halving: chunk 4 == B, half 2 < B changes the
    # program to the chunked path, which succeeds -> same tokens, and
    # the working chunk is remembered PER padded wav length.
    monkeypatch.setattr(fg, "MIN_KERNEL_BATCH", 2)
    fd.max_kernel_batch = 4
    fd._chunk_for_frames.clear()
    with pytest.warns(UserWarning, match="retrying with chunk 2"):
        got = np.asarray(fd(wav, lens))
    np.testing.assert_array_equal(got, want)
    assert fd._chunk_for_frames[16000] == 2
    assert fd.max_kernel_batch == 4            # default never mutated
    # second call at the same padded length: straight to chunk 2,
    # no failing attempt, no warning
    calls["n"] = 0
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        got2 = np.asarray(fd(wav, lens))
    np.testing.assert_array_equal(got2, want)
    assert calls["n"] == 0

    # (c) a bare INTERNAL error without Pallas/VMEM/remote-compile
    # context is NOT compile-shaped: propagate on first failure
    fd._run = lambda w, l: (_ for _ in ()).throw(
        RuntimeError("INTERNAL: something unrelated broke"))
    fd._chunk_for_frames.clear()
    with pytest.raises(RuntimeError, match="something unrelated"):
        fd(wav, lens)

    # (d) non-compile user errors propagate immediately too
    fd._run = lambda w, l: (_ for _ in ()).throw(ValueError("user bug"))
    fd._chunk_for_frames.clear()
    with pytest.raises(ValueError, match="user bug"):
        fd(wav, lens)

    # (e) an EXPLICIT max_kernel_batch disables the fallback entirely
    fd2 = interp.FusedGreedyDecoder(model, variables, max_length=6,
                                    max_kernel_batch=2)
    calls["n"] = 0
    fd2._run = failing_run
    fd2._make_chunked = lambda B, mb: failing_run
    with pytest.raises(RuntimeError, match="remote_compile"):
        fd2(wav, lens)
    assert calls["n"] == 1
    assert fd2.max_kernel_batch == 2
