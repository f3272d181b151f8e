"""Pure-Python METEOR approximation (exact + Porter-stem modules).

The reference scores METEOR through the pycocoevalcap Java jar
(reference python_scripts/train_eval/base.py:112-116), which this
environment cannot run (no JVM) and whose synonym/paraphrase modules
need WordNet/paraphrase data files that are not shipped here.  This
module implements the original METEOR algorithm (Banerjee & Lavie 2005
/ Lavie & Agarwal 2007) with the two data-free matcher stages:

  stage 1: exact surface match
  stage 2: Porter-stem match (nltk's pure-Python PorterStemmer)

Scores are therefore an APPROXIMATION of jar METEOR — a lower bound in
matching power (no synonyms/paraphrases) — and are surfaced as
``meteor_py``, never as ``meteor``, so nothing downstream can mistake
them for reference-comparable numbers.

Parameters are the classic METEOR defaults: Fmean weighs recall 9:1
(alpha = 0.9), fragmentation penalty gamma * (chunks / matches) ** beta
with gamma = 0.5, beta = 3.  Segment score = best over references;
corpus score = mean of segment scores (matching how pycocoevalcap's
other pure-Python scorers aggregate here).

Alignment semantics (Banerjee & Lavie, section 2): stages run in
order, each stage matching the words left free by the previous one;
within the staged structure the cardinality of every stage is maximal
(forced: edges exist only between identical keys, so per-key
cardinality = min(count_hyp, count_ref)), and among the
maximum-cardinality alignments the one with the FEWEST chunks is
selected.  The chunk-minimizing pairing is found by exhaustive
enumeration over the per-key pairing choices (captions are <= ~20
tokens so repeated matchable words are rare); a budget caps
pathological inputs, below which the search falls back to the best
alignment seen, seeded with the greedy in-order one.
"""

from __future__ import annotations

from itertools import combinations, permutations
from typing import Dict, List, Sequence, Tuple

from nltk.stem.porter import PorterStemmer

_ALPHA = 0.9
_BETA = 3.0
_GAMMA = 0.5
_ENUM_BUDGET = 100_000

_stemmer = PorterStemmer()
_stem_cache: Dict[str, str] = {}


def _stem(w: str) -> str:
    s = _stem_cache.get(w)
    if s is None:
        s = _stemmer.stem(w)
        _stem_cache[w] = s
    return s


def _stage_match_greedy(hyp: Sequence[str], ref: Sequence[str],
                        hyp_free: List[bool], ref_free: List[bool],
                        key) -> List[Tuple[int, int]]:
    """Greedy in-order stage matcher: each free hyp token takes the
    first free ref token with the same key.  One-to-one by
    construction; achieves the stage's maximum cardinality (per-key
    min counts) but NOT necessarily the minimum chunk count — used
    only to seed the exact search."""
    out: List[Tuple[int, int]] = []
    for i, hw in enumerate(hyp):
        if not hyp_free[i]:
            continue
        hk = key(hw)
        for j, rw in enumerate(ref):
            if ref_free[j] and key(rw) == hk:
                out.append((i, j))
                hyp_free[i] = False
                ref_free[j] = False
                break
    return out


def _count_chunks(matches: List[Tuple[int, int]]) -> int:
    """Chunks = maximal runs of matches contiguous AND monotone in both
    hypothesis and reference order."""
    if not matches:
        return 0
    matches = sorted(matches)
    chunks = 1
    for (i0, j0), (i1, j1) in zip(matches, matches[1:]):
        if i1 != i0 + 1 or j1 != j0 + 1:
            chunks += 1
    return chunks


def _stage_groups(hyp: Sequence[str], ref: Sequence[str],
                  hyp_free: List[bool], ref_free: List[bool],
                  key) -> List[Tuple[List[int], List[int]]]:
    """Group the free positions by match key; only keys present on
    both sides can produce matches."""
    groups: Dict[object, Tuple[List[int], List[int]]] = {}
    for i, w in enumerate(hyp):
        if hyp_free[i]:
            groups.setdefault(key(w), ([], []))[0].append(i)
    for j, w in enumerate(ref):
        if ref_free[j]:
            k = key(w)
            if k in groups:
                groups[k][1].append(j)
    return [(h, r) for h, r in groups.values() if h and r]


def _min_chunk_alignment(hyp: Sequence[str],
                         ref: Sequence[str]) -> Tuple[int, int]:
    """(matches, chunks) of the staged exact+stem alignment with the
    minimum-chunk tie-break over all maximum-cardinality pairings."""
    # greedy seed: same cardinality, upper-bounds the chunk count
    hf = [True] * len(hyp)
    rf = [True] * len(ref)
    seed = _stage_match_greedy(hyp, ref, hf, rf, key=lambda w: w)
    seed += _stage_match_greedy(hyp, ref, hf, rf, key=_stem)
    m = len(seed)
    if m == 0:
        return 0, 0
    best = [_count_chunks(seed)]
    budget = [_ENUM_BUDGET]
    hyp_free = [True] * len(hyp)
    ref_free = [True] * len(ref)

    def rec(groups, gi, partial, on_done):
        if best[0] == 1 or budget[0] <= 0:
            return
        if gi == len(groups):
            on_done(partial)
            return
        h, r = groups[gi]
        mk = min(len(h), len(r))
        for hs in combinations(h, mk):
            for rs in permutations(r, mk):
                budget[0] -= 1
                if budget[0] <= 0:
                    return
                pairs = list(zip(hs, rs))
                for i, j in pairs:
                    hyp_free[i] = False
                    ref_free[j] = False
                rec(groups, gi + 1, partial + pairs, on_done)
                for i, j in pairs:
                    hyp_free[i] = True
                    ref_free[j] = True

    def after_stage1(partial):
        groups2 = _stage_groups(hyp, ref, hyp_free, ref_free, _stem)

        def finish(full):
            c = _count_chunks(full)
            if c < best[0]:
                best[0] = c

        rec(groups2, 0, partial, finish)

    groups1 = _stage_groups(hyp, ref, hyp_free, ref_free, lambda w: w)
    rec(groups1, 0, [], after_stage1)
    return m, best[0]


def meteor_pair(hyp_tokens: Sequence[str],
                ref_tokens: Sequence[str]) -> float:
    """METEOR score of one hypothesis against one reference."""
    if not hyp_tokens or not ref_tokens:
        return 0.0
    m, chunks = _min_chunk_alignment(hyp_tokens, ref_tokens)
    if m == 0:
        return 0.0
    p = m / len(hyp_tokens)
    r = m / len(ref_tokens)
    fmean = p * r / (_ALPHA * p + (1.0 - _ALPHA) * r)
    frag = chunks / m
    penalty = _GAMMA * frag ** _BETA
    return fmean * (1.0 - penalty)


def meteor_sentence(hyp: str, refs: List[str]) -> float:
    h = hyp.split()
    return max((meteor_pair(h, ref.split()) for ref in refs),
               default=0.0)


def meteor_py(key2pred: Dict[str, List[str]],
              key2refs: Dict[str, List[str]]
              ) -> Tuple[float, Dict[str, float]]:
    """Corpus METEOR approximation -> (mean score, per-key scores)."""
    per_key = {k: meteor_sentence(v[0], key2refs[k])
               for k, v in key2pred.items()}
    avg = sum(per_key.values()) / max(len(per_key), 1)
    return avg, per_key
