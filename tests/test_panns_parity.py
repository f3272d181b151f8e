"""PANNs classifier parity (Cnn10, Wavegram_Logmel_Cnn14) against the
reference panns.py with random checkpoints.  The torchlibrosa frontend
is bypassed on both sides (ours is golden-tested separately): the torch
models' extractors are replaced with closures returning the shared
precomputed log-mel."""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "captioning")),
    reason="reference repo not mounted")


def _import_ref_panns():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "torchlibrosa" not in sys.modules or not hasattr(
            sys.modules.get("torchlibrosa.stft", None), "Spectrogram"):
        class _Stub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
        tl = types.ModuleType("torchlibrosa")
        st = types.ModuleType("torchlibrosa.stft")
        ta = types.ModuleType("torchlibrosa.augmentation")
        st.Spectrogram = _Stub
        st.LogmelFilterBank = _Stub
        ta.SpecAugmentation = _Stub
        tl.stft = st
        tl.augmentation = ta
        tl.Spectrogram = _Stub
        tl.LogmelFilterBank = _Stub
        tl.SpecAugmentation = _Stub
        sys.modules["torchlibrosa"] = tl
        sys.modules["torchlibrosa.stft"] = st
        sys.modules["torchlibrosa.augmentation"] = ta
    from captioning.models import panns
    return panns


def _patch_frontend(ref_model, lms: np.ndarray):
    """Replace the torchlibrosa extractors with closures emitting the
    precomputed [B, 1, T, M] log-mel."""
    mel_t = torch.as_tensor(lms)[:, None]
    del ref_model.spectrogram_extractor
    del ref_model.logmel_extractor
    ref_model.spectrogram_extractor = lambda wav: mel_t
    ref_model.logmel_extractor = lambda x: x


def _randomize_bn(ref):
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)


def test_cnn10_classifier_parity():
    ref_mod = _import_ref_panns()
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.panns import (
        Cnn10, convert_cnn10_classifier)
    torch.manual_seed(2)
    ref = ref_mod.Cnn10(32000, 1024, 320, 64, 50, 14000, classes_num=13)
    ref.eval()
    _randomize_bn(ref)
    rng = np.random.RandomState(0)
    lms = rng.randn(2, 64, 64).astype(np.float32) * 3.0
    _patch_frontend(ref, lms)
    with torch.no_grad():
        out_ref = ref(torch.zeros(2, 100))

    params, stats = convert_cnn10_classifier(
        state_dict_to_numpy(ref.state_dict()))
    model = Cnn10(classes_num=13)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(lms))
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               out_ref["clipwise_output"].numpy(),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["attn_feat"]),
                               out_ref["attn_feat"].numpy(), atol=1e-4)


@pytest.mark.slow
def test_wavegram_cnn14_parity():
    ref_mod = _import_ref_panns()
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.panns import (
        Wavegram_Logmel_Cnn14, convert_wavegram_cnn14)
    torch.manual_seed(3)
    ref = ref_mod.Wavegram_Logmel_Cnn14(32000, 1024, 320, 64, 50, 14000,
                                        classes_num=11)
    ref.eval()
    _randomize_bn(ref)
    rng = np.random.RandomState(1)
    wav = rng.randn(2, 64 * 320).astype(np.float32)   # 64 mel frames
    lms = rng.randn(2, 64, 64).astype(np.float32) * 3.0
    _patch_frontend(ref, lms)
    with torch.no_grad():
        out_ref = ref(torch.as_tensor(wav))

    params, stats = convert_wavegram_cnn14(
        state_dict_to_numpy(ref.state_dict()))
    model = Wavegram_Logmel_Cnn14(classes_num=11)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(wav), jnp.asarray(lms))
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               out_ref["clipwise_output"].numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["attn_feat"]),
                               out_ref["attn_feat"].numpy(), atol=1e-3,
                               rtol=1e-3)
