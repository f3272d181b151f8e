"""Style model, discriminator, loss wrappers, word-embedding init."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from audiocaption_tpu.losses.wrappers import (
    augment_loss_wrapper, condition_loss_wrapper, gumbel_softmax,
    multiple_loss_sum, reparameterize_argmax, specificity_loss_wrapper)
from audiocaption_tpu.losses import cross_entropy_loss, masked_token_loss
from audiocaption_tpu.models.hm_classifier import HmClassifier
from audiocaption_tpu.models.style import StyleBank, TextRefEncoder
from audiocaption_tpu.utils.word_embedding import (
    install_word_embedding, load_word_embedding, pca_reduce)


def test_text_ref_encoder():
    enc = TextRefEncoder(vocab_size=30, d_model=64, nlayers=1)
    cap = jnp.ones((2, 5), jnp.int32)
    cap_len = jnp.asarray([5, 3])
    v = enc.init(jax.random.PRNGKey(0), cap, cap_len)
    emb = enc.apply(v, cap, cap_len)
    assert emb.shape == (2, 64)


def test_style_bank_paths():
    bank = StyleBank(n_styles=4, style_dim=16)
    ref = jnp.asarray(np.random.RandomState(0).randn(2, 16), jnp.float32)
    v = bank.init(jax.random.PRNGKey(0), ref)
    s1 = bank.apply(v, ref)
    assert s1.shape == (2, 16)
    w = jnp.asarray([[1.0, 0, 0, 0], [0, 0, 0, 1.0]])
    s2 = bank.apply(v, w, method=StyleBank.from_weight)
    styles = v["params"]["styles"]
    np.testing.assert_allclose(np.asarray(s2[0]), np.asarray(styles[0]),
                               atol=1e-6)


def test_hm_classifier_hard_and_soft():
    clf = HmClassifier(vocab_size=20, emb_dim=8, hidden_size=8)
    cap = jnp.ones((2, 6), jnp.int32)
    cap_len = jnp.asarray([6, 3])
    v = clf.init(jax.random.PRNGKey(0), cap, cap_len)
    hard = clf.apply(v, cap, cap_len)
    soft = clf.apply(v, jax.nn.one_hot(cap, 20), cap_len)
    np.testing.assert_allclose(np.asarray(hard), np.asarray(soft),
                               atol=1e-5)


def test_straight_through_estimators():
    logit = jnp.asarray(np.random.RandomState(0).randn(3, 7), jnp.float32)
    hard = reparameterize_argmax(logit)
    assert np.allclose(np.asarray(hard).sum(-1), 1.0)
    assert (np.asarray(hard).max(-1) == 1.0).all()
    # gradient flows: d sum(hard * w) / d logit == w (identity path)
    w = jnp.ones_like(logit)
    g = jax.grad(lambda l: jnp.sum(reparameterize_argmax(l) * w))(logit)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), atol=1e-6)
    gs = gumbel_softmax(jax.random.PRNGKey(0), logit)
    assert np.allclose(np.asarray(gs).sum(-1), 1.0, atol=1e-5)


def _fake_output():
    rng = np.random.RandomState(0)
    return {
        "logit": jnp.asarray(rng.randn(4, 5, 11), jnp.float32),
        "tgt": jnp.asarray(rng.randint(0, 11, (4, 5))),
        "tgt_len": jnp.asarray([5, 4, 3, 5]),
    }


def test_multiple_loss_sum():
    out = _fake_output()
    base = masked_token_loss("cross_entropy")
    combo = multiple_loss_sum([base, base], [1.0, 0.5])
    np.testing.assert_allclose(float(combo(out)), 1.5 * float(base(out)),
                               rtol=1e-6)


def test_augment_loss_wrapper():
    out = _fake_output()
    out["aug_keep"] = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    none_fn = lambda o: cross_entropy_loss(o["logit"], o["tgt"],
                                           o["tgt_len"], reduction="none")
    wrapped = augment_loss_wrapper(none_fn)
    full = augment_loss_wrapper(none_fn)(
        {**out, "aug_keep": jnp.ones(4)})
    dropped = wrapped(out)
    assert np.isfinite(float(dropped))
    assert abs(float(dropped) - float(full)) > 1e-9  # sample 2 excluded


def test_condition_loss_wrapper():
    out = _fake_output()
    out["conditions"] = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    base = masked_token_loss("cross_entropy")

    def dscrm(soft_caps, tgt_len):
        return jax.nn.sigmoid(jnp.sum(soft_caps, axis=(1, 2)) * 0.01)
    fn = condition_loss_wrapper(base, dscrm, alpha=0.5)
    loss = fn(out)
    assert float(loss) > float(base(out))


def test_specificity_loss_wrapper():
    out = _fake_output()
    out["conditions"] = jnp.asarray([2.0, 1.0, 0.5, 1.5])
    ws = jnp.asarray(np.random.RandomState(1).rand(11), jnp.float32)
    base = masked_token_loss("cross_entropy")
    fn = specificity_loss_wrapper(base, ws, alpha=1.0)
    assert np.isfinite(float(fn(out)))


def test_word_embedding_pca_and_install(tmp_path):
    emb = np.random.RandomState(0).randn(40, 32).astype(np.float32)
    path = tmp_path / "w2v.npy"
    np.save(path, emb)
    loaded = load_word_embedding(str(path), 40, 16)
    assert loaded.shape == (40, 16)
    reduced = pca_reduce(emb, 16)
    assert reduced.shape == (40, 16)
    params = install_word_embedding({"other": 1}, loaded)
    assert params["word_embedding"]["embedding"].shape == (40, 16)
    with pytest.raises(ValueError):
        load_word_embedding(str(path), 5, 16)


def test_filter_pruning_rankings():
    from audiocaption_tpu.utils.pruning import (
        select_filters, prune_conv_params, prune_bn_params,
        l1_ranking, geometric_median_ranking, operator_norm_ranking)
    rng = np.random.RandomState(0)
    kernel = rng.randn(3, 3, 4, 8).astype(np.float32)
    kernel[..., 0] *= 10  # filter 0 clearly strongest
    for method in ("operator_norm", "iclr_l1", "iclr_gm"):
        keep = select_filters(kernel, prune_ratio=0.5, method=method)
        assert len(keep) == 4
        assert (np.diff(keep) > 0).all()
    keep = select_filters(kernel, 0.5, "iclr_l1")
    assert 0 in keep
    nxt = {"kernel": rng.randn(3, 3, 8, 16).astype(np.float32)}
    pruned, nxt_p = prune_conv_params({"kernel": kernel}, keep, nxt)
    assert pruned["kernel"].shape == (3, 3, 4, 4)
    assert nxt_p["kernel"].shape == (3, 3, 4, 16)
    bn_p, bn_s = prune_bn_params(
        {"scale": np.ones(8), "bias": np.zeros(8)},
        {"mean": np.zeros(8), "var": np.ones(8)}, keep)
    assert bn_p["scale"].shape == (4,)
