"""MobileNetV3/EfficientAT checkpoint parity: reference eff_at_encoder
MN trunk (random weights) -> convert_mobilenet_v3 -> output equality."""

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


def _install_tv_shim():
    """torchvision is absent; ConvNormActivation is the only symbol the
    reference eff_at_encoder imports from it.  This shim reproduces the
    public torchvision.ops.misc.ConvNormActivation contract (conv ->
    norm -> activation Sequential with the same default padding/bias)."""
    if "torchvision" in sys.modules and hasattr(
            sys.modules.get("torchvision.ops.misc", None),
            "ConvNormActivation"):
        return

    class ConvNormActivation(torch.nn.Sequential):
        def __init__(self, in_channels, out_channels, kernel_size=3,
                     stride=1, padding=None, groups=1,
                     norm_layer=torch.nn.BatchNorm2d,
                     activation_layer=torch.nn.ReLU, dilation=1,
                     inplace=True, bias=None):
            if padding is None:
                padding = (kernel_size - 1) // 2 * dilation
            if bias is None:
                bias = norm_layer is None
            layers = [torch.nn.Conv2d(in_channels, out_channels,
                                      kernel_size, stride, padding,
                                      dilation=dilation, groups=groups,
                                      bias=bias)]
            if norm_layer is not None:
                layers.append(norm_layer(out_channels))
            if activation_layer is not None:
                layers.append(activation_layer(inplace=inplace))
            super().__init__(*layers)
            self.out_channels = out_channels

    tv = sys.modules.get("torchvision", types.ModuleType("torchvision"))
    ops = types.ModuleType("torchvision.ops")
    misc = types.ModuleType("torchvision.ops.misc")
    misc.ConvNormActivation = ConvNormActivation
    ops.misc = misc
    tv.ops = ops
    if not hasattr(tv, "models"):
        tvm = types.ModuleType("torchvision.models")
        tvm.resnet50 = lambda *a, **k: None
        tvm.resnext50_32x4d = lambda *a, **k: None
        tv.models = tvm
        sys.modules["torchvision.models"] = tv.models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.ops.misc"] = misc


def _import_ref():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    _install_tv_shim()
    from captioning.models import eff_at_encoder
    return eff_at_encoder


@pytest.mark.slow
@pytest.mark.parametrize("model_name", ["mn04", "mn10"])
def test_mobilenet_v3_feature_parity(model_name):
    ref_mod = _import_ref()
    from audiocaption_tpu.models.convert import state_dict_to_numpy
    from audiocaption_tpu.models.mobilenet_v3 import (
        MobileNetV3Encoder, NAME_TO_WIDTH, convert_mobilenet_v3)

    torch.manual_seed(4)
    ref = ref_mod.get_model(model_name=model_name, pretrained=False,
                            width_mult=NAME_TO_WIDTH[model_name])
    ref.eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    enc = MobileNetV3Encoder(model_name=model_name, pooling="mean")
    params, stats = convert_mobilenet_v3(
        state_dict_to_numpy(ref.state_dict()))
    # bn0 left at identity default on both sides (the reference bn0
    # lives in the cnn_encoder wrapper, not the MN trunk)
    import jax
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 320, 64)),
                    jnp.asarray([320]))
    variables = {
        "params": {**init["params"], **params},
        "batch_stats": {**init["batch_stats"], **stats},
    }

    rng = np.random.RandomState(0)
    lms = rng.randn(2, 320, 64).astype(np.float32)
    with torch.no_grad():
        x = torch.as_tensor(lms)[:, None]           # [B, 1, T, M]
        feats = ref.features(x)                     # [B, C, T/32, M/32]
        ref_attn = torch.mean(feats, dim=3).transpose(1, 2).numpy()

    out = enc.apply(variables, jnp.asarray(lms),
                    jnp.asarray([32000, 16000]) // 100)
    np.testing.assert_allclose(np.asarray(out["attn_emb"]), ref_attn,
                               atol=5e-4, rtol=1e-3)
