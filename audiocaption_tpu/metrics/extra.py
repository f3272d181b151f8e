"""Offline caption quality scripts beyond the core metrics:

  * specificity — mean summed word-specificity per caption
    (reference python_scripts/eval/specificity.py:13-26): word
    specificity values come from the -log unigram-frequency table the
    data tools produce (cli/data_tools.py extract_specificity, TSV
    columns word/specificity);
  * CLAP text-text similarity (reference
    python_scripts/eval/clap_score.py:10-57) — prediction embedding
    dotted against each reference caption embedding, MEAN over the
    references, averaged over the corpus.  Uses the transformers
    ClapModel text tower ("laion/clap-htsat-unfused"); gated on the
    weights being available (this environment has no network, so the
    CLI surfaces a loud skip instead of a number).

Exposed on the CLI as ``eval_tools specificity`` / ``eval_tools clap``.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

_CLAP_MODEL_NAME = "laion/clap-htsat-unfused"


def specificity_score(predictions: List[str],
                      word_specificity: Dict[str, float]) -> float:
    """Mean over captions of the summed per-word specificity.

    Unlike the reference (which KeyErrors on a word missing from the
    table, specificity.py:19-21), unknown words contribute 0 so the
    score is defined for any prediction set.
    """
    totals = []
    for cap in predictions:
        totals.append(sum(word_specificity.get(w, 0.0)
                          for w in cap.split()))
    return float(np.mean(totals)) if totals else 0.0


def load_word_specificity(path: str) -> Dict[str, float]:
    """Read the word/specificity TSV written by data_tools
    extract_specificity (same format the reference's
    prepare_text_metadata emits)."""
    out: Dict[str, float] = {}
    with open(path) as f:
        header = f.readline().strip().split("\t")
        wi, si = header.index("word"), header.index("specificity")
        for line in f:
            cols = line.rstrip("\n").split("\t")
            if len(cols) > max(wi, si):
                out[cols[wi]] = float(cols[si])
    return out


def build_word_specificity(corpus: List[str]) -> Dict[str, float]:
    """IDF-style specificity from a caption corpus: -log(p(word))
    (prepare_text_metadata specificity flow)."""
    from collections import Counter
    counts = Counter(w for cap in corpus for w in cap.split())
    total = sum(counts.values())
    return {w: float(-np.log(c / total)) for w, c in counts.items()}


def _load_clap(model_name: str):
    from transformers import AutoTokenizer, ClapModel
    model = ClapModel.from_pretrained(model_name)
    tokenizer = AutoTokenizer.from_pretrained(model_name)
    return model, tokenizer


def clap_text_similarity(predictions: Dict[str, List[str]],
                         references: Dict[str, List[str]],
                         model=None, tokenizer=None,
                         model_name: str = _CLAP_MODEL_NAME,
                         ) -> Optional[Tuple[float, Dict[str, float]]]:
    """CLAP text-text score: prediction text embedding dotted against
    each reference embedding, mean over refs per key, mean over keys
    (clap_score.py:37-57).  Returns (corpus mean, per-key scores), or
    None when the CLAP weights are unavailable (no-network
    environments).  ``model``/``tokenizer`` may be injected (tests, or
    a locally cached checkpoint)."""
    import torch

    if model is None or tokenizer is None:
        try:
            model, tokenizer = _load_clap(model_name)
        except Exception:
            return None
    model.eval()

    def embed(texts: List[str]) -> "torch.Tensor":
        inputs = tokenizer(texts, padding=True, return_tensors="pt")
        with torch.no_grad():
            return model.get_text_features(**inputs)

    per_key: Dict[str, float] = {}
    for k, preds in predictions.items():
        refs = references[k]
        emb = embed(preds[:1] + list(refs))
        # reference clap_score.py:49-51: raw dot product, mean over refs
        per_key[k] = float((emb[0:1] @ emb[1:].T).mean().item())
    avg = float(np.mean(list(per_key.values()))) if per_key else 0.0
    return avg, per_key
