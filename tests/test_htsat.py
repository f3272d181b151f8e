"""HTSAT Swin audio encoder tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocaption_tpu.models.htsat import (
    HtsatEncoder, _shift_mask, relative_position_index, window_partition,
    window_reverse)


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3))
    w = window_partition(x, 8)
    assert w.shape == (2 * 4, 64, 3)
    back = window_reverse(w, 8, 16, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_relative_position_index_range():
    idx = relative_position_index(8)
    assert idx.shape == (64, 64)
    assert idx.min() >= 0 and idx.max() < 15 * 15
    # symmetric pairs map to mirrored offsets: diag is the center index
    assert (np.diag(idx) == idx[0, 0]).all()


def test_shift_mask_blocks():
    mask = _shift_mask(16, 16, 8, 4)
    assert mask.shape == (4, 64, 64)
    # unshifted interior window has no masking
    assert (mask[0] == 0).all()
    # boundary windows mask cross-region attention
    assert (mask[-1] < 0).any()


@pytest.mark.slow
def test_htsat_encoder_shapes():
    enc = HtsatEncoder()
    lms = jnp.asarray(np.random.RandomState(0).randn(1, 1001, 64),
                      jnp.float32)
    fl = jnp.asarray([1001])
    v = enc.init(jax.random.PRNGKey(0), lms, fl)
    out = enc.apply(v, lms, fl)
    assert out["attn_emb"].shape == (1, 32, 768)
    assert out["fc_emb"].shape == (1, 768)
    assert int(out["attn_emb_len"][0]) == 31
    n = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    assert 25e6 < n < 30e6   # HTSAT-base ~28M params


@pytest.mark.slow
def test_htsat_short_audio_interpolates():
    enc = HtsatEncoder()
    lms = jnp.zeros((1, 501, 64))        # 5 s -> interpolated to 1024
    v = enc.init(jax.random.PRNGKey(0), lms, jnp.asarray([501]))
    out = enc.apply(v, lms, jnp.asarray([501]))
    assert out["attn_emb"].shape == (1, 32, 768)
    assert int(out["attn_emb_len"][0]) == 501 // 32


# ---------------------------------------------------------------------------
# Checkpoint-level parity against the reference htsat.py (round-1 weak
# item #7: converters were never exercised against a real torch
# state_dict round-trip).
# ---------------------------------------------------------------------------

def _import_ref_htsat():
    import os
    import sys
    import types
    import torch
    REF_ROOT = "/root/reference"
    if not os.path.isdir(os.path.join(REF_ROOT, "captioning")):
        return None
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "toml" not in sys.modules:
        sys.modules["toml"] = types.ModuleType("toml")
    if "ruamel" not in sys.modules:
        ru = types.ModuleType("ruamel")
        ry = types.ModuleType("ruamel.yaml")
        ru.yaml = ry
        sys.modules["ruamel"] = ru
        sys.modules["ruamel.yaml"] = ry
    if "torchlibrosa" not in sys.modules:
        class _Stub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
        tl = types.ModuleType("torchlibrosa")
        ta = types.ModuleType("torchlibrosa.augmentation")
        ta.SpecAugmentation = _Stub
        tl.augmentation = ta
        tl.SpecAugmentation = _Stub
        tl.LogmelFilterBank = _Stub
        tl.Spectrogram = _Stub
        st = types.ModuleType("torchlibrosa.stft")
        st.Spectrogram = _Stub
        st.LogmelFilterBank = _Stub
        tl.stft = st
        sys.modules["torchlibrosa"] = tl
        sys.modules["torchlibrosa.augmentation"] = ta
        sys.modules["torchlibrosa.stft"] = st
    import captioning.models.htsat as ref_htsat
    return ref_htsat


@pytest.mark.slow
def test_htsat_checkpoint_parity():
    """Random torch HTSAT -> convert_htsat -> output equality: the
    latent time sequence (attn_emb) matches the reference's
    fine_grained pre-interpolation latent (htsat.py:880-896) and the
    pooled fc_emb matches 'embedding'."""
    import torch
    ref_mod = _import_ref_htsat()
    if ref_mod is None:
        pytest.skip("reference not mounted")
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.htsat import HtsatEncoder, convert_htsat

    torch.manual_seed(9)
    cfg = {"audio_args": {"n_fft": 1024, "hop_length": 320, "n_mels": 64,
                          "sr": 32000, "f_min": 50, "f_max": 14000}}
    ref = ref_mod.HTSAT_Swin_Transformer(
        spec_size=256, patch_size=4, patch_stride=(4, 4), in_chans=1,
        num_classes=10, embed_dim=96, depths=[2, 2, 6, 2],
        num_heads=[4, 8, 16, 32], window_size=8, config=cfg)
    ref.eval()
    with torch.no_grad():
        ref.bn0.running_mean.uniform_(-2, 2)
        ref.bn0.running_var.uniform_(0.5, 2.0)

    params, stats = convert_htsat(state_dict_to_numpy(ref.state_dict()))
    enc = HtsatEncoder()
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(0)
    T = 1024                      # exactly spec_size * freq_ratio: the
    lms = rng.randn(2, T, 64).astype(np.float32)   # bicubic path is off

    with torch.no_grad():
        x = torch.as_tensor(lms)[:, None]          # [B, 1, T, F]
        x = x.transpose(1, 3)
        x = ref.bn0(x)
        x = x.transpose(1, 3)
        x = ref.reshape_wav2img(x)
        out_ref = ref.forward_features(x)
    # fine_grained_embedding repeats each latent step 32x; every 32nd
    # row recovers the [B, 32, C] latent sequence
    ref_latent = out_ref["fine_grained_embedding"][:, ::32, :].numpy()
    ref_emb = out_ref["embedding"].numpy()

    out = enc.apply(variables, jnp.asarray(lms),
                    jnp.asarray([T, T]))
    np.testing.assert_allclose(np.asarray(out["attn_emb"]), ref_latent,
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["fc_emb"]), ref_emb,
                               atol=5e-4, rtol=1e-3)


def test_shifted_swin_block_compiles_under_jit():
    """_shift_mask must stay pure numpy: under jit, jnp ops on the
    static mask image stage tracers that numpy cannot convert back
    (regression: HTSAT previously failed to trace inside a train
    step)."""
    import jax
    import jax.numpy as jnp
    from audiocaption_tpu.models.htsat import SwinBlock

    blk = SwinBlock(8, 2, 4, 2, 4.0)
    x = jnp.zeros((1, 64, 8))
    variables = blk.init(jax.random.PRNGKey(0), x, (8, 8))

    @jax.jit
    def fwd(v, x):
        return blk.apply(v, x, (8, 8))

    out = fwd(variables, x)
    assert out.shape == (1, 64, 8)
