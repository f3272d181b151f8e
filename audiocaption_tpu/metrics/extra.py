"""Offline caption quality scripts beyond the core metrics:

  * specificity — mean summed word-specificity per caption
    (python_scripts/eval/specificity.py): word specificity values come
    from an IDF-style table (prepare_text_metadata);
  * CLAP text-text similarity (python_scripts/eval/clap_score.py:37-55)
    — gated on laion_clap availability (needs model weights).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def specificity_score(predictions: List[str],
                      word_specificity: Dict[str, float]) -> float:
    """Mean over captions of the summed per-word specificity."""
    totals = []
    for cap in predictions:
        totals.append(sum(word_specificity.get(w, 0.0)
                          for w in cap.split()))
    return float(np.mean(totals)) if totals else 0.0


def build_word_specificity(corpus: List[str]) -> Dict[str, float]:
    """IDF-style specificity from a caption corpus: -log(p(word))
    (prepare_text_metadata specificity flow)."""
    from collections import Counter
    counts = Counter(w for cap in corpus for w in cap.split())
    total = sum(counts.values())
    return {w: float(-np.log(c / total)) for w, c in counts.items()}


def clap_text_similarity(predictions: Dict[str, List[str]],
                         references: Dict[str, List[str]]
                         ) -> Optional[float]:
    """LAION-CLAP text-text cosine between prediction and references,
    max over refs, averaged (clap_score.py:37-55).  Returns None when
    laion_clap (and its weights) are unavailable."""
    try:
        import laion_clap
    except ImportError:
        return None
    model = laion_clap.CLAP_Module(enable_fusion=False)
    model.load_ckpt()
    sims = []
    for k, preds in predictions.items():
        texts = preds[:1] + references[k]
        emb = model.get_text_embedding(texts)
        emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        sims.append(float(np.max(emb[0] @ emb[1:].T)))
    return float(np.mean(sims))
