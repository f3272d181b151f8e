"""Pretrained word-embedding initialization for decoders
(reference BaseDecoder.load_word_embedding, models/__init__.py:82-92,
and python_scripts/utils/word2vec/create_word_embedding.py).

Loads a [vocab, dim] numpy array (the artifact the reference's word2vec
script produces), optionally freezes it, and installs it into a decoder
param tree.  PCA-reduction of larger pretrained vectors is supported
like the reference script.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def pca_reduce(embeddings: np.ndarray, dim: int) -> np.ndarray:
    """Project embeddings to ``dim`` via PCA (create_word_embedding.py)."""
    x = embeddings - embeddings.mean(0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return x @ vt[:dim].T


def load_word_embedding(path: str, vocab_size: int, emb_dim: int
                        ) -> np.ndarray:
    """Load a .npy embedding matrix; PCA-reduce if wider than emb_dim."""
    emb = np.load(path)
    if emb.shape[0] != vocab_size:
        raise ValueError(f"embedding rows {emb.shape[0]} != vocab "
                         f"{vocab_size}")
    if emb.shape[1] > emb_dim:
        emb = pca_reduce(emb, emb_dim)
    elif emb.shape[1] < emb_dim:
        raise ValueError(f"embedding dim {emb.shape[1]} < {emb_dim}")
    return emb.astype(np.float32)


def install_word_embedding(decoder_params: Dict, embedding: np.ndarray
                           ) -> Dict:
    """Return a copy of the decoder param tree with word_embedding set."""
    out = dict(decoder_params)
    out["word_embedding"] = {"embedding": np.asarray(embedding,
                                                     np.float32)}
    return out


def train_word2vec(sentences, embed_size: int, window: int = 5,
                   epochs: int = 10, negatives: int = 5,
                   lr: float = 0.025, min_count: int = 1,
                   batch_size: int = 4096, seed: int = 0
                   ) -> Dict[str, np.ndarray]:
    """Skip-gram with negative sampling, trained with one jitted JAX
    step (replaces the reference's gensim Word2Vec,
    word2vec/create_word_embedding.py: min_count 1, 10 epochs).

    sentences: list of token lists -> {word: [embed_size] vector}.
    Negatives are drawn from the unigram^0.75 distribution; the
    in-embedding is returned (gensim's wv convention).
    """
    import jax
    import jax.numpy as jnp
    from collections import Counter

    counter = Counter(w for s in sentences for w in s)
    vocab = [w for w, c in counter.items() if c >= min_count]
    word2idx = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    if V == 0:
        return {}

    rng = np.random.RandomState(seed)
    centers, contexts = [], []
    for s in sentences:
        ids = [word2idx[w] for w in s if w in word2idx]
        for i, c in enumerate(ids):
            lo = max(0, i - window)
            hi = min(len(ids), i + window + 1)
            for j in range(lo, hi):
                if j != i:
                    centers.append(c)
                    contexts.append(ids[j])
    if not centers:
        return {w: rng.randn(embed_size).astype(np.float32)
                for w in vocab}
    centers = np.asarray(centers, np.int32)
    contexts = np.asarray(contexts, np.int32)

    freqs = np.asarray([counter[w] for w in vocab], np.float64) ** 0.75
    neg_probs = jnp.asarray(freqs / freqs.sum(), jnp.float32)

    w_in = jnp.asarray(
        (rng.rand(V, embed_size) - 0.5) / embed_size, jnp.float32)
    w_out = jnp.zeros((V, embed_size), jnp.float32)

    def loss_fn(params, c_ids, o_ids, neg_ids):
        win, wout = params
        vc = win[c_ids]                          # [B, D]
        vo = wout[o_ids]                         # [B, D]
        vn = wout[neg_ids]                       # [B, N, D]
        pos = jax.nn.log_sigmoid(jnp.sum(vc * vo, -1))
        neg = jnp.sum(jax.nn.log_sigmoid(
            -jnp.einsum("bd,bnd->bn", vc, vn)), -1)
        return -jnp.mean(pos + neg)

    @jax.jit
    def step(params, key, c_ids, o_ids):
        key, sub = jax.random.split(key)
        neg_ids = jax.random.choice(
            sub, V, (c_ids.shape[0], negatives), p=neg_probs)
        loss, grads = jax.value_and_grad(loss_fn)(params, c_ids, o_ids,
                                                  neg_ids)
        params = jax.tree_util.tree_map(
            lambda p, g: p - lr * g, params, grads)
        return params, key, loss

    params = (w_in, w_out)
    key = jax.random.PRNGKey(seed)
    n = len(centers)
    for _ in range(epochs):
        order = rng.permutation(n)
        for s0 in range(0, n, batch_size):
            idx = order[s0:s0 + batch_size]
            if len(idx) < batch_size:       # fixed shape under jit
                idx = np.concatenate(
                    [idx, rng.choice(n, batch_size - len(idx))])
            params, key, _ = step(params, key,
                                  jnp.asarray(centers[idx]),
                                  jnp.asarray(contexts[idx]))
    w_in = np.asarray(params[0])
    return {w: w_in[i] for w, i in word2idx.items()}
