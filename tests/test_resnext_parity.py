"""ESResNeXtFBSP parity against the reference resnext.py: the FBSP
learnable filterbank, 3-band dB image pipeline, and the attention-gated
ResNeXt-50 trunk, end to end on a random checkpoint."""

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


def _import_ref_resnext():
    """torchvision is absent here; the reference only touches tv.models
    inside its pretrained loading_func, which these tests never call."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet50 = lambda *a, **k: None
        tvm.resnext50_32x4d = lambda *a, **k: None
        tv.models = tvm
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
    import captioning.models.resnext as ref_rx
    return ref_rx


REF_RX = _import_ref_resnext()


def _pair(apply_attention):
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.resnext import (
        ESResNeXtFBSP, convert_esresnext)
    torch.manual_seed(5)
    ref = REF_RX.ESResNeXtFBSP(n_fft=256, num_classes=13,
                               apply_attention=apply_attention,
                               pretrained=False)
    ref.eval()
    # jitter FBSP params + BN stats so the frontend/BN paths are
    # nontrivial
    with torch.no_grad():
        ref.fbsp.m.uniform_(0.5, 2.0)
        ref.fbsp.fb.uniform_(0.5, 2.0)
        for mod in ref.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.uniform_(-1, 1)
                mod.running_var.uniform_(0.5, 2.0)
    model = ESResNeXtFBSP(n_fft=256, num_classes=13,
                          apply_attention=apply_attention)
    params, stats = convert_esresnext(
        state_dict_to_numpy(ref.state_dict()),
        apply_attention=apply_attention)
    return ref, model, {"params": params, "batch_stats": stats}


def test_fbsp_filterbank_parity():
    """LinearFBSP materialized weights + frame transform
    (resnext.py:787-890)."""
    ref, model, variables = _pair(False)
    rng = np.random.RandomState(0)
    frames = rng.randn(2, 5, 256).astype(np.float32)
    with torch.no_grad():
        spec_ref, w_ref = ref.fbsp(torch.as_tensor(frames))
    spec, (w_re, w_im) = model.apply(
        variables, jnp.asarray(frames),
        method=lambda m, f: m.fbsp(f))
    np.testing.assert_allclose(np.asarray(w_re),
                               w_ref[..., 0].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(w_im),
                               w_ref[..., 1].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(spec), spec_ref.numpy(),
                               atol=1e-3, rtol=1e-4)


def test_db_image_parity():
    """frame -> FBSP -> 3-band power -> align_corners bilinear resize ->
    dB (resnext.py:635-692)."""
    ref, model, variables = _pair(False)
    rng = np.random.RandomState(1)
    wav = (rng.randn(2, 8000) * 8000).astype(np.float32)
    with torch.no_grad():
        x_db_ref = ref._forward_pre_processing(torch.as_tensor(wav))
    img, _ = model.apply(variables, jnp.asarray(wav),
                         method=lambda m, w: m.db_image(w))
    got = np.transpose(np.asarray(img), (0, 3, 1, 2))[:, None]
    np.testing.assert_allclose(got, x_db_ref.numpy(), atol=5e-3,
                               rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("apply_attention", [False, True])
def test_esresnext_fbsp_end_to_end(apply_attention):
    ref, model, variables = _pair(apply_attention)
    rng = np.random.RandomState(2)
    wav = (rng.randn(2, 8000) * 8000).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.as_tensor(wav)).numpy()
    out = model.apply(variables, jnp.asarray(wav))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-2,
                               rtol=1e-3)


def test_encoder_contract():
    from audiocaption_tpu.models.resnext import (
        ESResNeXtFBSP, ESResNeXtFBSPEncoder)
    import jax
    enc = ESResNeXtFBSPEncoder(
        fbsp_model=ESResNeXtFBSP(n_fft=256, num_classes=13))
    wav = jnp.zeros((2, 8000))
    wl = jnp.asarray([8000, 4000])
    v = enc.init(jax.random.PRNGKey(0), wav, wl)
    out = enc.apply(v, wav, wl)
    assert out["attn_emb"].shape == (2, 7, 2048)
    assert out["fc_emb"].shape == (2, 2048)
