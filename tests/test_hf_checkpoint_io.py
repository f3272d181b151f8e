"""HF-zoo checkpoint ingestion roundtrip.

Real wsntxxn/* checkpoints cannot be downloaded here (no network —
MIGRATION.md), but the full plumbing is testable offline: export our
variables into the reference's exact key naming + torch layouts
(models/export.py, inverse of models/convert.py), ``torch.save`` them,
then ingest through the public ``load_torch_checkpoint`` path
(hf_api.py) and require token-for-token parity with the original
variables.  This exercises every name mapping a downloaded
``wsntxxn/effb2-trm-*`` / ``cnn14rnn-tempgru`` checkpoint flows through
(reference hf_wrapper.py:1115-1181, 1862-1973)."""

import numpy as np
import pytest
import torch

import jax


def _to_torch(sd):
    out = {}
    for k, v in sd.items():
        out[k] = torch.as_tensor(np.asarray(v))
    return out


def _jitter_decoder(api, seed, scale=0.4):
    """Random inits can greedy-decode degenerately (constant token);
    jitter the decoder so trajectories are weight-dependent."""
    import jax.tree_util as tu
    rng = np.random.RandomState(seed)
    v = jax.device_get(api.variables)
    v["params"]["decoder"] = tu.tree_map(
        lambda x: np.asarray(x)
        + rng.randn(*np.shape(x)).astype(np.float32) * scale,
        v["params"]["decoder"])
    api.variables = v
    api._decode = {}


@pytest.fixture(scope="module")
def effb2_api_pair():
    from audiocaption_tpu.hf_api import (Effb2TrmCaptioningModel,
                                         Effb2TrmConfig)
    cfg = Effb2TrmConfig(vocab_size=48)
    src = Effb2TrmCaptioningModel(cfg, seed=3)
    _jitter_decoder(src, 11)
    dst = Effb2TrmCaptioningModel(cfg, seed=99)   # different random init
    _jitter_decoder(dst, 42)
    return cfg, src, dst


def test_effb2_converter_roundtrip_tree_equal(effb2_api_pair):
    """convert(export(tree)) must reproduce the tree exactly."""
    from audiocaption_tpu.models import export
    from audiocaption_tpu.models.effb2 import convert_effb2
    from audiocaption_tpu.models.transformer_decoder import (
        convert_transformer_decoder)
    cfg, src, _ = effb2_api_pair
    sd = export.effb2_trm_hf_state_dict(
        src.variables, nlayers=cfg.decoder_n_layers,
        tie_weights=cfg.decoder_we_tie_weights)
    enc_p, enc_s = convert_effb2(sd,
                                 "model.model.encoder.backbone.eff_net")
    dec_p = convert_transformer_decoder(
        sd, "model.model.decoder", nlayers=cfg.decoder_n_layers,
        tie_weights=cfg.decoder_we_tie_weights)
    want = jax.device_get(src.variables)

    def assert_tree_equal(a, b, path=""):
        assert set(a) == set(b), (path, set(a) ^ set(b))
        for k in a:
            if isinstance(a[k], dict):
                assert_tree_equal(a[k], b[k], f"{path}/{k}")
            else:
                np.testing.assert_array_equal(
                    np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{path}/{k}")

    assert_tree_equal(want["params"]["encoder"], enc_p, "params/encoder")
    assert_tree_equal(want["batch_stats"]["encoder"], enc_s,
                      "batch_stats/encoder")
    assert_tree_equal(want["params"]["decoder"], dec_p, "params/decoder")


def test_effb2_load_torch_checkpoint_token_parity(effb2_api_pair,
                                                  tmp_path):
    """torch.save(exported sd) -> load_torch_checkpoint -> same tokens
    as the source model, for greedy AND beam (the ingestion path
    hf_api.py load_torch_checkpoint/load_torch_state_dict)."""
    from audiocaption_tpu.models import export
    cfg, src, dst = effb2_api_pair
    rng = np.random.RandomState(0)
    audio = rng.randn(3, 14000).astype(np.float32)
    lens = [14000, 9000, 12000]

    want_g = src(audio, lens, sample_method="greedy", max_length=8)
    want_b = src(audio, lens, sample_method="beam", beam_size=3,
                 max_length=8)
    got_pre = dst(audio, lens, sample_method="greedy", max_length=8)
    assert not np.array_equal(got_pre, want_g)  # inits genuinely differ

    path = tmp_path / "pytorch_model.bin"
    torch.save(_to_torch(export.effb2_trm_hf_state_dict(
        src.variables, nlayers=cfg.decoder_n_layers,
        tie_weights=cfg.decoder_we_tie_weights)), path)
    dst.load_torch_checkpoint(str(path))
    np.testing.assert_array_equal(
        dst(audio, lens, sample_method="greedy", max_length=8), want_g)
    np.testing.assert_array_equal(
        dst(audio, lens, sample_method="beam", beam_size=3, max_length=8),
        want_b)


def test_effb2_load_handles_state_dict_wrapper(effb2_api_pair, tmp_path):
    """Checkpoints wrapped as {'state_dict': ...} (the GH-release zip
    format) must load identically."""
    from audiocaption_tpu.models import export
    cfg, src, dst = effb2_api_pair
    sd = _to_torch(export.effb2_trm_hf_state_dict(
        src.variables, nlayers=cfg.decoder_n_layers,
        tie_weights=cfg.decoder_we_tie_weights))
    path = tmp_path / "wrapped.pth"
    torch.save({"state_dict": sd}, path)
    dst.load_torch_checkpoint(str(path))
    rng = np.random.RandomState(1)
    audio = rng.randn(1, 9000).astype(np.float32)
    np.testing.assert_array_equal(
        dst(audio, [9000], sample_method="greedy", max_length=6),
        src(audio, [9000], sample_method="greedy", max_length=6))


@pytest.mark.slow
def test_tempgru_load_torch_checkpoint_token_parity(tmp_path):
    """Same roundtrip for the temporal model's key space
    (cap_model.encoder.{cnn,rnn} / cap_model.decoder / sed_model,
    hf_wrapper.py:1898-1935)."""
    from audiocaption_tpu.hf_api import (Cnn14RnnTempAttnGruConfig,
                                         Cnn14RnnTempAttnGruModel)
    from audiocaption_tpu.models import export
    cfg = Cnn14RnnTempAttnGruConfig(vocab_size=40)
    src = Cnn14RnnTempAttnGruModel(cfg, seed=5)
    dst = Cnn14RnnTempAttnGruModel(cfg, seed=77)
    import jax.tree_util as tu
    for api, seed in ((src, 11), (dst, 42)):
        rng = np.random.RandomState(seed)
        v = jax.device_get(api.variables)
        v["params"]["decoder"] = tu.tree_map(
            lambda x: np.asarray(x)
            + rng.randn(*np.shape(x)).astype(np.float32) * 0.4,
            v["params"]["decoder"])
        api.variables = v
        api._fns = {}

    rng = np.random.RandomState(2)
    audio = rng.randn(2, 32000).astype(np.float32)
    lens = [32000, 20000]
    want = src(audio, lens, sample_method="greedy", max_length=6)
    got_pre = dst(audio, lens, sample_method="greedy", max_length=6)
    assert not np.array_equal(got_pre, want)

    path = tmp_path / "tempgru.bin"
    torch.save(_to_torch(export.cnn14rnn_tempgru_hf_state_dict(
        src.variables, src.sed_variables,
        rnn_num_layers=cfg.encoder_rnn_num_layers)), path)
    dst.load_torch_checkpoint(str(path))
    np.testing.assert_array_equal(
        dst(audio, lens, sample_method="greedy", max_length=6), want)
    # user temporal tag flows through after the reload too
    tagged = dst(audio, lens, temporal_tag=[0, 0],
                 sample_method="greedy", max_length=6)
    np.testing.assert_array_equal(
        tagged, src(audio, lens, temporal_tag=[0, 0],
                    sample_method="greedy", max_length=6))
