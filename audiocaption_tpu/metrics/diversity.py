"""Caption diversity metrics (python_scripts/eval/diversity.py:14-31):
vocabulary size, % novel captions vs the training corpus,
distinct-1/distinct-2, and self-BLEU over the prediction set.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Optional

from audiocaption_tpu.metrics.bleu import corpus_bleu


def diversity_metrics(predictions: List[str],
                      train_captions: Optional[Iterable[str]] = None
                      ) -> Dict[str, float]:
    tokens = [p.split() for p in predictions]
    vocab = set(t for toks in tokens for t in toks)

    def distinct(n: int) -> float:
        grams = Counter()
        total = 0
        for toks in tokens:
            for i in range(len(toks) - n + 1):
                grams[tuple(toks[i:i + n])] += 1
                total += 1
        return len(grams) / total if total else 0.0

    out = {
        "vocab_size": float(len(vocab)),
        "distinct_1": distinct(1),
        "distinct_2": distinct(2),
    }
    if train_captions is not None:
        train_set = set(train_captions)
        novel = sum(1 for p in predictions if p not in train_set)
        out["novel_ratio"] = novel / max(len(predictions), 1)

    # self-BLEU: each prediction scored against all the others
    if len(predictions) > 1:
        key2pred = {str(i): [p] for i, p in enumerate(predictions)}
        key2refs = {str(i): predictions[:i] + predictions[i + 1:]
                    for i in range(len(predictions))}
        bleu, _ = corpus_bleu(key2pred, key2refs)
        out["self_bleu_4"] = bleu[3]
    return out


def instance_diversity_metrics(predictions: List[str],
                               train_captions: Optional[Iterable[str]]
                               = None) -> Dict[str, float]:
    """Per-caption diversity, averaged over captions
    (python_scripts/eval/diversity_instance.py:47-86): distinct-n is the
    within-caption unique-ngram ratio, not the corpus-level pool."""
    tokens = [p.split() for p in predictions]
    vocab = set(t for toks in tokens for t in toks)

    def distinct(toks: List[str], n: int) -> float:
        grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        return len(set(grams)) / len(grams) if grams else 0.0

    out = {
        "vocab_size": float(len(vocab)),
        "distinct_1": (sum(distinct(t, 1) for t in tokens)
                       / max(len(tokens), 1)),
        "distinct_2": (sum(distinct(t, 2) for t in tokens)
                       / max(len(tokens), 1)),
    }
    if train_captions is not None:
        train_set = set(train_captions)
        novel = sum(1 for p in predictions if p not in train_set)
        out["novel_ratio"] = novel / max(len(predictions), 1)
    return out
