"""Torch-parity tests for the neural building blocks.

Each test builds the equivalent torch module, copies its weights through
``models.convert``, and compares outputs. This pins the exact layer
semantics needed for checkpoint-level token parity.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from audiocaption_tpu.models import convert
from audiocaption_tpu.models.layers import (
    GRU, GRUCellStack, TransformerDecoderLayer, BatchNorm, ConvBlock,
    MultiheadAttention, causal_mask, pool_2d, sinusoidal_positions)


def sd(module):
    return convert.state_dict_to_numpy(module.state_dict())


# ----------------------------------------------------------------- GRU ----

@pytest.mark.parametrize("bidirectional,num_layers", [
    (False, 1), (True, 1), (True, 3)])
def test_gru_matches_torch_packed(bidirectional, num_layers):
    torch.manual_seed(0)
    I, H, B, T = 12, 16, 4, 9
    tmod = tnn.GRU(I, H, num_layers=num_layers, bidirectional=bidirectional,
                   batch_first=True)
    tmod.eval()
    x = torch.randn(B, T, I)
    lens = torch.tensor([9, 5, 7, 1])

    packed = tnn.utils.rnn.pack_padded_sequence(
        x, lens, batch_first=True, enforce_sorted=False)
    out_packed, h_n = tmod(packed)
    want, _ = tnn.utils.rnn.pad_packed_sequence(
        out_packed, batch_first=True, total_length=T)

    jmod = GRU(hidden_size=H, num_layers=num_layers,
               bidirectional=bidirectional)
    params = convert.gru(sd(tmod), "", num_layers, bidirectional)
    # strip the leading "." from keys produced by empty prefix
    params = {k.lstrip("."): v for k, v in params.items()}
    got, got_h = jmod.apply({"params": params}, jnp.asarray(x.numpy()),
                            jnp.asarray(lens.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(got_h), h_n.detach().numpy(),
                               atol=2e-6)


def test_gru_cell_stack_matches_torch_stepwise():
    torch.manual_seed(1)
    I, H, B, L = 8, 10, 3, 2
    tmod = tnn.GRU(I, H, num_layers=L, batch_first=True)
    tmod.eval()
    jmod = GRUCellStack(hidden_size=H, num_layers=L)
    params = convert.gru_cell_stack(sd(tmod), "", L)
    params = {k.lstrip("."): v for k, v in params.items()}

    h_t = torch.zeros(L, B, H)
    h_j = jnp.zeros((L, B, H))
    for step in range(4):
        x = torch.randn(B, 1, I)
        out_t, h_t = tmod(x, h_t)
        out_j, h_j = jmod.apply({"params": params},
                                jnp.asarray(x.numpy()[:, 0]), h_j)
        np.testing.assert_allclose(np.asarray(out_j),
                                   out_t[:, 0].detach().numpy(), atol=2e-6)
        np.testing.assert_allclose(np.asarray(h_j), h_t.detach().numpy(),
                                   atol=2e-6)


# ----------------------------------------------------- Transformer layer ----

def _torch_dec_layer(E, H, FF):
    layer = tnn.TransformerDecoderLayer(
        d_model=E, nhead=H, dim_feedforward=FF, dropout=0.0,
        batch_first=True)
    layer.eval()
    return layer


def test_transformer_decoder_layer_matches_torch():
    torch.manual_seed(2)
    E, H, FF, B, Tq, S = 32, 4, 64, 3, 6, 11
    tmod = _torch_dec_layer(E, H, FF)
    x = torch.randn(B, Tq, E)
    mem = torch.randn(B, S, E)
    tgt_mask = torch.triu(torch.full((Tq, Tq), float("-inf")), diagonal=1)
    mem_kpm = torch.zeros(B, S, dtype=torch.bool)
    mem_kpm[:, 8:] = True
    tgt_kpm = torch.zeros(B, Tq, dtype=torch.bool)
    tgt_kpm[1, 4:] = True
    want = tmod(x, mem, tgt_mask=tgt_mask, tgt_key_padding_mask=tgt_kpm,
                memory_key_padding_mask=mem_kpm).detach().numpy()

    jmod = TransformerDecoderLayer(d_model=E, num_heads=H,
                                   dim_feedforward=FF, dropout=0.0)
    params = convert.transformer_decoder_layer(sd(tmod), "")
    params = {k.lstrip("."): v for k, v in params.items()}
    got = jmod.apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(mem.numpy()),
        tgt_mask=causal_mask(Tq),
        tgt_key_padding_mask=jnp.asarray(tgt_kpm.numpy()),
        memory_key_padding_mask=jnp.asarray(mem_kpm.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_decoder_layer_step_matches_full_forward():
    """KV-cached step decoding must equal full causal forward."""
    rng = jax.random.PRNGKey(0)
    E, H, FF, B, L, S = 32, 4, 64, 2, 5, 7
    jmod = TransformerDecoderLayer(d_model=E, num_heads=H,
                                   dim_feedforward=FF, dropout=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, L, E))
    mem = jax.random.normal(jax.random.PRNGKey(2), (B, S, E))
    mem_kpm = jnp.asarray([[False] * 7, [False] * 4 + [True] * 3])
    params = jmod.init(rng, x, mem)["params"]

    full = jmod.apply({"params": params}, x, mem, tgt_mask=causal_mask(L),
                      memory_key_padding_mask=mem_kpm)

    mem_k, mem_v = jmod.apply({"params": params}, mem,
                              method=TransformerDecoderLayer.precompute_memory)
    self_k = jnp.zeros((B, L, E))
    self_v = jnp.zeros((B, L, E))
    for t in range(L):
        kpm = jnp.arange(L)[None, :] > t
        kpm = jnp.broadcast_to(kpm, (B, L))
        out_t, self_k, self_v = jmod.apply(
            {"params": params}, x[:, t], jnp.int32(t), self_k, self_v, kpm,
            mem_k, mem_v, mem_kpm, method=TransformerDecoderLayer.step)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(full[:, t]),
                                   atol=1e-5)


def test_mha_matches_torch():
    torch.manual_seed(3)
    E, H, B, Tq, Tk = 24, 3, 2, 4, 6
    tmod = tnn.MultiheadAttention(E, H, dropout=0.0, batch_first=True)
    tmod.eval()
    q = torch.randn(B, Tq, E)
    k = torch.randn(B, Tk, E)
    v = torch.randn(B, Tk, E)
    kpm = torch.zeros(B, Tk, dtype=torch.bool)
    kpm[0, 4:] = True
    want, _ = tmod(q, k, v, key_padding_mask=kpm)

    jmod = MultiheadAttention(embed_dim=E, num_heads=H, dropout=0.0)
    params = convert.mha(sd(tmod), "")
    # convert.mha expects prefix-less keys; build manually
    s = sd(tmod)
    s = {f"m.{k}": v for k, v in s.items()}
    params = convert.mha(s, "m")
    got = jmod.apply({"params": params}, jnp.asarray(q.numpy()),
                     jnp.asarray(k.numpy()), jnp.asarray(v.numpy()),
                     key_padding_mask=jnp.asarray(kpm.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=1e-5)


# ------------------------------------------------------------ Conv / BN ----

def test_batchnorm_eval_and_train_match_torch():
    torch.manual_seed(4)
    C = 6
    tmod = tnn.BatchNorm2d(C)
    x = torch.randn(3, C, 5, 4)

    # train step: check running stats update + normalized output
    tmod.train()
    want_train = tmod(x).detach().numpy()

    jmod = BatchNorm()
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))  # NCHW -> NHWC
    variables = jmod.init(jax.random.PRNGKey(0), xj)
    got_train, updates = jmod.apply(variables, xj, train=True,
                                    mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_train).transpose(0, 3, 1, 2),
                               want_train, atol=1e-5)
    np.testing.assert_allclose(np.asarray(updates["batch_stats"]["mean"]),
                               tmod.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["batch_stats"]["var"]),
                               tmod.running_var.numpy(), atol=1e-5)

    # eval: uses running stats
    tmod.eval()
    want_eval = tmod(x).detach().numpy()
    bn_p, bn_s = convert.batchnorm({f"b.{k}": v for k, v in sd(tmod).items()}, "b")
    got_eval = jmod.apply({"params": bn_p, "batch_stats": bn_s}, xj)
    np.testing.assert_allclose(np.asarray(got_eval).transpose(0, 3, 1, 2),
                               want_eval, atol=1e-5)


def test_conv_block_matches_torch_panns():
    """PANNs ConvBlock eval parity: conv-bn-relu x2 + avg pool."""
    torch.manual_seed(5)

    class TorchConvBlock(tnn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, 1, 1, bias=False)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.bn2 = tnn.BatchNorm2d(cout)

        def forward(self, x, pool):
            import torch.nn.functional as F
            x = F.relu_(self.bn1(self.conv1(x)))
            x = F.relu_(self.bn2(self.conv2(x)))
            return F.avg_pool2d(x, pool)

    tmod = TorchConvBlock(1, 8)
    # randomize BN stats so eval parity is non-trivial
    tmod.bn1.running_mean.data.normal_()
    tmod.bn1.running_var.data.uniform_(0.5, 2.0)
    tmod.eval()
    x = torch.randn(2, 1, 10, 8)
    want = tmod(x, (2, 2)).detach().numpy()

    jmod = ConvBlock(features=8)
    s = {f"blk.{k}": v for k, v in sd(tmod).items()}
    params, stats = convert.conv_block(s, "blk")
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = jmod.apply({"params": params, "batch_stats": stats}, xj)
    got = pool_2d(got, (2, 2), "avg")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               want, atol=1e-5)


def test_sinusoidal_positions_match_reference_formula():
    pe = sinusoidal_positions(100, 16)
    assert pe.shape == (100, 16)
    np.testing.assert_allclose(pe[0], np.array([0., 1.] * 8), atol=1e-7)
    np.testing.assert_allclose(pe[3, 0], np.sin(3.0), atol=1e-6)
    np.testing.assert_allclose(pe[3, 1], np.cos(3.0), atol=1e-6)


def test_conv2dsame_bf16_differentiable():
    """bf16 conv must be differentiable: with preferred_element_type=f32
    the conv grad rule used to feed the f32 cotangent into a bf16 conv
    and lax raised a dtype mismatch (bf16 training was broken)."""
    from audiocaption_tpu.models.layers import Conv2dSame
    conv = Conv2dSame(4, (3, 3), padding=1, compute_dtype=jnp.bfloat16)
    x = jnp.ones((1, 8, 8, 2), jnp.bfloat16)
    v = conv.init(jax.random.PRNGKey(0), x)

    def loss(params):
        return jnp.sum(conv.apply({"params": params}, x)
                       .astype(jnp.float32))

    g = jax.grad(loss)(v["params"])
    assert jnp.all(jnp.isfinite(g["kernel"]))
