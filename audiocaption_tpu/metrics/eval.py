"""Caption evaluation aggregator (reference _eval_prediction,
train_eval/base.py:72-127): BLEU-1..4, ROUGE-L, CIDEr, and — when the
optional Java-backed pycocoevalcap scorers are importable — METEOR and
SPICE, with SPIDEr = (CIDEr + SPICE) / 2.  Fense is used when its
package + checkpoint are available.

Unlike the reference, BLEU/ROUGE/CIDEr run in pure Python here, so the
core metric path needs no JVM; when pycocoevalcap *is* present its PTB
tokenizer and scorers are preferred for bit-compatibility.
"""

from __future__ import annotations

import shutil
from typing import Dict, List, Optional

from audiocaption_tpu.metrics.bleu import corpus_bleu
from audiocaption_tpu.metrics.cider import CiderD
from audiocaption_tpu.metrics.rouge import rouge_l
from audiocaption_tpu.metrics.tokenize import ptb_tokenize


def _java_available() -> bool:
    return shutil.which("java") is not None


def _try_pycoco():
    try:
        from pycocoevalcap.tokenizer.ptbtokenizer import PTBTokenizer
        return PTBTokenizer
    except ImportError:
        return None


def evaluate_captions(key2pred: Dict[str, List[str]],
                      key2refs: Dict[str, List[str]],
                      zh: bool = False,
                      use_java: Optional[bool] = None,
                      per_audio: bool = False) -> Dict:
    """-> {bleu_1..bleu_4, rouge_l, cider, meteor?, spice?, spider?,
    fense?, per_audio?}."""
    if use_java is None:
        use_java = _java_available() and _try_pycoco() is not None

    skipped: List[str] = []
    if not zh:
        # the reference scores PTB-tokenized captions (base.py:101-110);
        # prefer the Java tokenizer for bit-compatibility, else use the
        # regex approximation and SAY SO — scores over differently
        # tokenized captions are not reference-comparable
        PTB = _try_pycoco() if use_java else None
        tokenized = False
        if PTB is not None:
            try:
                tok = PTB()
                fmt = lambda d: {k: [{"caption": c} for c in v]
                                 for k, v in d.items()}
                key2pred = tok.tokenize(fmt(key2pred))
                key2refs = tok.tokenize(fmt(key2refs))
                tokenized = True
            except Exception:
                pass
        if not tokenized:
            key2pred = ptb_tokenize(key2pred)
            key2refs = ptb_tokenize(key2refs)
            skipped.append("ptb_tokenizer (regex substitute — scores "
                           "not bit-comparable to pycocoevalcap)")

    result: Dict = {}
    bleu, bleu_per_key = corpus_bleu(key2pred, key2refs)
    for i, s in enumerate(bleu, 1):
        result[f"bleu_{i}"] = s
    result["rouge_l"], rouge_per_key = rouge_l(key2pred, key2refs)
    cider = CiderD()
    result["cider"], cider_scores = cider.compute_score(key2refs, key2pred)

    if use_java:
        try:
            from pycocoevalcap.meteor.meteor import Meteor
            from pycocoevalcap.spice.spice import Spice
            m, _ = Meteor().compute_score(key2refs, key2pred)
            result["meteor"] = m
            s, _ = Spice().compute_score(key2refs, key2pred)
            result["spice"] = s
            result["spider"] = (result["cider"] + result["spice"]) / 2
        except Exception as e:
            skipped.append(f"meteor/spice/spider ({type(e).__name__})")
    else:
        # No JVM: report the pure-Python approximations under their own
        # keys so they can never be mistaken for the jar scorers —
        # meteor_py (exact+stem Banerjee-Lavie alignment), spice_py
        # (lexicon-based proposition F1) and spider_py
        # = (CIDEr-D + spice_py)/2.
        from audiocaption_tpu.metrics.meteor import meteor_py
        from audiocaption_tpu.metrics.spice import spice_py
        result["meteor_py"], meteor_per_key = meteor_py(key2pred, key2refs)
        result["spice_py"], spice_per_key = spice_py(key2pred, key2refs)
        result["spider_py"] = (result["cider"] + result["spice_py"]) / 2
        skipped.append("meteor/spice/spider (no java/pycocoevalcap; "
                       "meteor_py/spice_py/spider_py are pure-Python "
                       "approximations)")

    try:
        from fense.evaluator import Evaluator
        fense_eval = Evaluator(device="cpu",
                               sbert_model="paraphrase-TinyBERT-L6-v2")
        keys = list(key2pred.keys())
        preds = [key2pred[k][0] for k in keys]
        refs = [key2refs[k] for k in keys]
        fense_score = fense_eval.corpus_score(preds, refs,
                                              agg_score="mean")
        result["fense"] = float(fense_score)
    except Exception as e:
        skipped.append(f"fense ({type(e).__name__})")

    # Never silently drop scorers: BASELINE's quality target is SPIDEr
    # parity, so a result without it must say so loudly.
    if skipped:
        import sys
        result["skipped_scorers"] = skipped
        print(f"[metrics] skipped scorers: {', '.join(skipped)}",
              file=sys.stderr)

    if per_audio:
        result["per_audio"] = {
            k: {"cider": float(cider_scores[i]),
                "bleu_4": bleu_per_key[k][3],
                "rouge_l": rouge_per_key[k]}
            for i, k in enumerate(key2pred.keys())
        }
        if "meteor_py" in result:
            for k in result["per_audio"]:
                result["per_audio"][k]["meteor_py"] = meteor_per_key[k]
                result["per_audio"][k]["spice_py"] = spice_per_key[k]
    return result
