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
