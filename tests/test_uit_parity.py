"""UIT faithful-rebuild parity against the reference uit.py (uit_xxxs /
uit_xs variants, BNeckAttention incl. its full-dim softmax-scale quirk,
init_bn, separable pos embeds, mean pooling head)."""

import os
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF_ROOT, "captioning")),
    reason="reference repo not mounted")


def _import_ref_uit():
    """Import reference uit.py with shims for import-time deps that are
    absent here (timm, loguru, torchaudio); the modules under test are
    untouched reference code.  The frontend is bypassed in the tests
    (our mel frontend has its own golden-value tests), so the
    torchaudio stubs are never called."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "toml" not in sys.modules:
        sys.modules["toml"] = types.ModuleType("toml")
    if "loguru" not in sys.modules:
        lg = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None
        lg.logger = _L()
        sys.modules["loguru"] = lg
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        tm = types.ModuleType("timm.models")
        tl = types.ModuleType("timm.models.layers")
        th = types.ModuleType("timm.models.layers.helpers")

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        class DropPath(torch.nn.Module):
            def __init__(self, p=0.0):
                super().__init__()
                self.p = p

            def forward(self, x):
                return x
        th.to_2tuple = to_2tuple
        tl.to_2tuple = to_2tuple
        tl.DropPath = DropPath
        tl.trunc_normal_ = torch.nn.init.trunc_normal_
        tm.layers = tl
        timm.models = tm
        for name, mod in (("timm", timm), ("timm.models", tm),
                          ("timm.models.layers", tl),
                          ("timm.models.layers.helpers", th)):
            sys.modules[name] = mod
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tt = types.ModuleType("torchaudio.transforms")

        class _Stub(torch.nn.Module):
            def __init__(self, *a, **k):
                super().__init__()
        tt.MelSpectrogram = _Stub
        tt.AmplitudeToDB = _Stub
        ta.transforms = tt
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tt
    import captioning.models.uit as ref_uit
    return ref_uit


REF_UIT = _import_ref_uit()


@pytest.mark.parametrize("variant", ["uit_xxxs", "uit_xs"])
def test_uit_output_parity(variant):
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.uit import UIT_VARIANTS, convert_uit

    torch.manual_seed(3)
    ref = getattr(REF_UIT, variant)(outputdim=11, target_length=102)
    ref.eval()
    # nontrivial BN running stats so init_bn conversion is exercised
    with torch.no_grad():
        bn = ref.init_bn[1]
        bn.running_mean.uniform_(-2, 2)
        bn.running_var.uniform_(0.5, 2.0)

    model = UIT_VARIANTS[variant](outputdim=11, target_length=102)
    params, stats = convert_uit(state_dict_to_numpy(ref.state_dict()),
                                model)
    variables = {"params": params, "batch_stats": stats}

    rng = np.random.RandomState(0)
    # reference spectrogram image [B, 1, F, T] (post-frontend); ours
    # takes the log-mel [B, T, M]
    x = rng.randn(2, 1, 64, 102).astype(np.float32) * 5.0

    with torch.no_grad():
        xr = ref.init_bn(torch.as_tensor(x))
        feats = ref.forward_features(xr)
        out_ref = ref.forward_head(feats).numpy()

    lms = jnp.asarray(np.transpose(x[:, 0], (0, 2, 1)))   # [B, T, M]

    def fwd(m, lms):
        img = m.normed_spectrogram(lms)
        return m.forward_head(m.forward_features(img))

    out = model.apply(variables, lms, method=fwd)
    np.testing.assert_allclose(np.asarray(out), out_ref,
                               atol=2e-5, rtol=1e-4)


def test_uit_pos_embed_resize():
    """Reference change_pos_embedding (uit.py:425-450): slice when
    shorter, bilinear when longer."""
    from audiocaption_tpu.models.uit import _resize_pos_embed
    pe = np.random.RandomState(1).randn(1, 8, 1, 10).astype(np.float32)
    assert _resize_pos_embed(pe, 6, 3).shape == (1, 8, 1, 6)
    np.testing.assert_array_equal(_resize_pos_embed(pe, 6, 3),
                                  pe[..., :6])
    up = _resize_pos_embed(pe, 20, 3)
    assert up.shape == (1, 8, 1, 20)
    ref = torch.nn.functional.interpolate(
        torch.as_tensor(pe), size=(1, 20), align_corners=False,
        mode="bilinear").numpy()
    np.testing.assert_allclose(up, ref, atol=1e-5)
