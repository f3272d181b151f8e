"""Offline data tooling (reference data/augment/*, data/create_dataset/
prepare_car.py + prepare_text_metadata/*, python_scripts/utils/
{word2vec/create_word_embedding,model_eval_diff,predict_nrst_ngbr}.py).

Subcommands (python -m audiocaption_tpu.cli.data_tools <cmd> ...):

  speed_perturb        sox-pipe wav.csv + duplicated captions
                       (speed_perturb.py:28-44); --compute resamples
                       waveforms itself (scipy polyphase) into an h5 so
                       no sox/ffmpeg is needed
  back_translate       en->romance->en caption augmentation via MarianMT
                       (back_translate.py; needs downloadable HF models)
  subset_concat        corpus mixing a%-of-A + B (a_subset_concat_b.py)
  text_similarity      caption-embedding similarity caption augmentation
                       (text_similarity.py)
  retrieve_similarity  audio->text retrieval pseudo-corpus
                       (retrieve_similarity.py)
  prepare_car          AudioCaption-Car zh corpus text.json
                       (prepare_car.py; takes the label json paths as
                       arguments instead of hardcoded cluster paths)
  extract_specificity  -log unigram-frequency word/caption specificity
                       (extract_specificity.py)
  extract_keyword      per-caption keywords (keyword/extract_caption_
                       keyword.py); uses stanza POS when importable,
                       otherwise a stopword/vocabulary heuristic
  extract_syntax       constituency/POS metadata via a CoreNLP server
                       (extract_syntax.py; thin nltk wrapper)
  create_word_embedding word2vec training (JAX SGNS; replaces gensim) or
                       pretrained + PCA -> [vocab, dim] .npy
  predict_nrst_ngbr    nearest-neighbor caption transfer
                       (predict_nrst_ngbr.py)
  model_eval_diff      all-refs minus leave-one-out metric diff
                       (model_eval_diff.py)
  pred_to_anno         prediction json -> annotation json
                       (pred_to_anno.py)
  concat_anno_json     merge annotation jsons (concat_anno_json.py)
  concat_pred_json     merge prediction jsons (concat_pred_json.py)
  prepare_wav_csv      scan a directory into a wav csv
                       (prepare_wav_csv.py)
  wavcsv_from_textjson subset a waveform csv by annotation ids
                       (wavcsv_from_textjson.py)
"""

from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _load_audios(path: str) -> List[Dict]:
    with open(path) as f:
        return json.load(f)["audios"]


def _dump_audios(audios: List[Dict], path: str):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump({"audios": audios}, f, indent=4, ensure_ascii=False)


# --------------------------------------------------------------------------
# speed perturbation (speed_perturb.py)
# --------------------------------------------------------------------------

def speed_perturb(input_dir: str, output_dir: str,
                  speeds=(0.9, 1.1), sr: int = 16000,
                  compute: bool = False):
    import pandas as pd
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    wav_df = pd.read_csv(Path(input_dir) / "wav.csv", sep="\t")
    audios = _load_audios(str(Path(input_dir) / "text.json"))
    aid_to_item = {a["audio_id"]: a for a in audios}

    sp_rows = []
    sp_items = []
    h5_out = None
    if compute:
        import h5py
        from scipy.signal import resample_poly
        from fractions import Fraction
        h5_path = out / "waveform_sp.h5"
        h5_out = h5py.File(h5_path, "w")

    for _, row in wav_df.iterrows():
        aid = row["audio_id"]
        for speed in speeds:
            sp_aid = f"sp{speed}-{aid}"
            if compute:
                import h5py
                from scipy.signal import resample_poly
                from fractions import Fraction
                with h5py.File(row["hdf5_path"], "r") as f:
                    wav = np.asarray(f[aid], np.float32)
                frac = Fraction(1.0 / speed).limit_denominator(1000)
                sp = resample_poly(wav, frac.numerator, frac.denominator)
                h5_out[sp_aid] = sp.astype(np.float16)
                sp_rows.append({"audio_id": sp_aid,
                                "hdf5_path": str(h5_path)})
            else:
                fname = row.get("file_name", row.get("hdf5_path"))
                sp_rows.append({
                    "audio_id": sp_aid,
                    "file_name": f"ffmpeg -i {fname} -f wav -ar {sr} "
                                 f"-ab 16 - | sox -t wav - -t wav - "
                                 f"speed {speed} |"})
            if aid in aid_to_item:
                item = json.loads(json.dumps(aid_to_item[aid]))
                item["audio_id"] = sp_aid
                sp_items.append(item)
    if h5_out is not None:
        h5_out.close()
    _dump_audios(audios + sp_items, str(out / "text.json"))
    import pandas as pd
    pd.DataFrame(sp_rows).to_csv(out / "wav.csv", sep="\t", index=False)
    print(f"wrote {len(sp_rows)} perturbed rows to {out}")


# --------------------------------------------------------------------------
# back translation (back_translate.py)
# --------------------------------------------------------------------------

def back_translate(input: str, output: str, batch_size: int = 32,
                   target_lang: str = "fr",
                   en_to_med: str = "Helsinki-NLP/opus-mt-en-ROMANCE",
                   med_to_en: str = "Helsinki-NLP/opus-mt-ROMANCE-en"):
    try:
        from transformers import MarianMTModel, MarianTokenizer
        tok_fwd = MarianTokenizer.from_pretrained(en_to_med)
        mod_fwd = MarianMTModel.from_pretrained(en_to_med)
        tok_bwd = MarianTokenizer.from_pretrained(med_to_en)
        mod_bwd = MarianMTModel.from_pretrained(med_to_en)
    except Exception as e:
        raise SystemExit(
            f"back_translate needs the MarianMT models ({en_to_med}, "
            f"{med_to_en}); loading failed: {type(e).__name__}: {e}")

    def translate(texts, model, tok, language):
        src = [t if language == "en" else f">>{language}<< {t}"
               for t in texts]
        tokens = tok(src, return_tensors="pt", padding=True)
        return tok.batch_decode(model.generate(**tokens),
                                skip_special_tokens=True)

    data = _load_audios(input)
    captions = sorted({c["caption"] for item in data
                       for c in item["captions"]})
    mapping = {}
    for i in range(0, len(captions), batch_size):
        batch = captions[i:i + batch_size]
        med = translate(batch, mod_fwd, tok_fwd, target_lang)
        back = translate(med, mod_bwd, tok_bwd, "en")
        mapping.update(zip(batch, back))
    bt = []
    for item in data:
        b = json.loads(json.dumps(item))
        for c in b["captions"]:
            c["caption"] = mapping[c["caption"]]
            c["cap_id"] = f"{c['cap_id']}_backtranslate"
        bt.append(b)
    _dump_audios(bt, output)


# --------------------------------------------------------------------------
# corpus mixing (a_subset_concat_b.py)
# --------------------------------------------------------------------------

def subset_concat(set_a: str, set_b: str, subset_a_output: str,
                  all_output: str, a_percent: float, seed: int = 1,
                  total_number: Optional[int] = None):
    random.seed(seed)
    a_data = _load_audios(set_a)
    b_data = _load_audios(set_b)
    a_number = int(len(a_data) * a_percent)
    total = total_number if total_number is not None else len(a_data)
    b_number = total - a_number
    if Path(subset_a_output).exists():
        a_subset = _load_audios(subset_a_output)
        assert len(a_subset) == a_number
    else:
        a_subset = random.sample(a_data, a_number)
        _dump_audios(a_subset, subset_a_output)
    b_subset = b_data if b_number > len(b_data) \
        else random.sample(b_data, b_number)
    _dump_audios(a_subset + b_subset, all_output)
    print(f"a: {a_number}, b: {len(b_subset)}")


# --------------------------------------------------------------------------
# similarity mining (text_similarity.py / retrieve_similarity.py)
# --------------------------------------------------------------------------

def _cosine(a: np.ndarray, b: Optional[np.ndarray] = None) -> np.ndarray:
    a = a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True), 1e-12)
    if b is None:
        b = a
    else:
        b = b / np.maximum(np.linalg.norm(b, axis=-1, keepdims=True),
                           1e-12)
    return a @ b.T


def text_similarity(input_label: str, text_embedding: str,
                    output_label: str, thresholds=(0.9, 1.0),
                    max_caption_aug: Optional[int] = None,
                    nearest: bool = False, exclude_real: bool = False,
                    seed: int = 1):
    """Caption-similarity augmentation: pull near-duplicate captions of
    OTHER clips in as extra references (text_similarity.py)."""
    import h5py
    random.seed(seed)
    embeds, keys = [], []
    with h5py.File(text_embedding, "r") as store:
        for key, emb in store.items():
            embeds.append(np.asarray(emb))
            keys.append(key)
    sim = _cosine(np.stack(embeds))
    data = _load_audios(input_label)
    aid_to_idx = {a["audio_id"]: i for i, a in enumerate(data)}
    aid_len = len(next(iter(aid_to_idx)))

    for idx in range(sim.shape[0]):
        aid = keys[idx][:aid_len]
        cap_id = keys[idx][aid_len + 1:]
        matched = {keys[j]: sim[idx][j] for j in np.where(
            (sim[idx] > thresholds[0]) & (sim[idx] < thresholds[1]))[0]}
        order = list(matched.keys())
        random.shuffle(order)
        if nearest and order:
            order = [k for k, _ in sorted(matched.items(),
                                          key=lambda x: -x[1])]
        n = 0
        for mk in order:
            m_aid = mk[:aid_len]
            m_cap = mk[aid_len + 1:]
            if m_aid == aid:
                continue
            n += 1
            aug = dict(data[aid_to_idx[m_aid]]["captions"][int(m_cap) - 1])
            aug["cap_id"] = f"{cap_id}_textaug_{n}"
            data[aid_to_idx[aid]]["captions"].append(aug)
            if max_caption_aug and n >= max_caption_aug:
                break

    if exclude_real:
        out = []
        for item in data:
            caps = [c for c in item["captions"]
                    if "aug" in str(c["cap_id"])]
            if caps:
                out.append({"audio_id": item["audio_id"],
                            "captions": caps})
        _dump_audios(out, output_label)
    else:
        _dump_audios(data, output_label)


def retrieve_similarity(annotation: str, sim_store: str, output: str,
                        thresholds=(0.0, 1.0),
                        max_caption_aug: Optional[int] = None,
                        nearest: bool = False,
                        exclude_real: bool = False, seed: int = 1):
    """Audio->text retrieval pseudo corpus from a precomputed
    [audio x caption] similarity h5 (retrieve_similarity.py)."""
    import h5py
    random.seed(seed)
    data = _load_audios(annotation)
    cap_map = {f"{a['audio_id']}_{c['cap_id']}": c
               for a in data for c in a["captions"]}
    with h5py.File(sim_store, "r") as store:
        sim = np.asarray(store["sim"])
        audio_ids = [x.decode() for x in store["audio_id"][()]]
        cap_ids = ([x.decode() for x in store["text_id"][()]]
                   if "text_id" in store else list(audio_ids))
        if len(data[0]["captions"]) == 1 and "text_id" not in store:
            cap_ids = [c + "_1" for c in cap_ids]
    if len(cap_map) != len(cap_ids):
        avail = set(cap_map)
        keep = [i for i, c in enumerate(cap_ids) if c in avail]
        sim = sim[:, keep]
        cap_ids = [cap_ids[i] for i in keep]

    aug_data = []
    for ai, aid in enumerate(audio_ids):
        matched = {cap_ids[j]: sim[ai][j] for j in np.where(
            (sim[ai] >= thresholds[0]) & (sim[ai] <= thresholds[1]))[0]}
        order = list(matched.keys())
        random.shuffle(order)
        if nearest and order:
            order = [k for k, _ in sorted(matched.items(),
                                          key=lambda x: -x[1])]
        caps = []
        for n, ck in enumerate(order, 1):
            aug = dict(cap_map[ck])
            aug["cap_id"] = f"retriveaug_{n}"
            aug["similarity"] = f"{matched[ck]:.3f}"
            caps.append(aug)
            if max_caption_aug and n >= max_caption_aug:
                break
        if caps:
            aug_data.append({"audio_id": aid, "captions": caps})
    if exclude_real:
        print(f"{len(aug_data)} augment audio after filtering")
        _dump_audios(aug_data, output)
    else:
        _dump_audios(data, output)


def audio_similarity(ref_embedding: str, ref_caption: str,
                     new_embedding: str, output: str,
                     threshold: float = 0.95):
    """Cross-corpus audio-similarity caption transfer (generalized
    audio_similarity.py / audio_subset_similarity.py, whose reference
    versions hardcode clotho/FSD50K cluster paths): every clip in
    ``new_embedding`` whose nearest reference clip exceeds ``threshold``
    inherits that clip's captions."""
    import h5py
    r_embs, r_ids = [], []
    with h5py.File(ref_embedding, "r") as store:
        for aid, emb in store.items():
            r_embs.append(np.asarray(emb))
            r_ids.append(aid)
    n_embs, n_ids = [], []
    with h5py.File(new_embedding, "r") as store:
        for aid, emb in store.items():
            n_embs.append(np.asarray(emb))
            n_ids.append(aid)
    aid_to_caps = {a["audio_id"]: a["captions"]
                   for a in _load_audios(ref_caption)}
    sim = _cosine(np.stack(n_embs), np.stack(r_embs))
    out = []
    for i, aid in enumerate(n_ids):
        j = int(sim[i].argmax())
        if sim[i][j] > threshold and r_ids[j] in aid_to_caps:
            caps = []
            for n, c in enumerate(aid_to_caps[r_ids[j]], 1):
                cc = dict(c)
                cc["cap_id"] = f"audioaug_{n}"
                cc["similarity"] = f"{sim[i][j]:.3f}"
                caps.append(cc)
            out.append({"audio_id": aid, "captions": caps})
    print(f"{len(out)} of {len(n_ids)} clips matched above {threshold}")
    _dump_audios(out, output)


def filter_new_audio_aug(wav_csv: str, generator_pred: str,
                         event_generator_pred: str, retrieval_pred: str,
                         output: str, blacklist: Optional[str] = None,
                         min_sim: float = 0.5):
    """Pseudo-caption selection for new audio (filter_new_audio_aug.py):
    keep the best of {generator, event generator, retrieval} captions by
    audio-text similarity, dropping clips below ``min_sim``."""
    bl = set()
    if blacklist:
        bl = {line.strip() for line in open(blacklist) if line.strip()}
    aids = []
    with open(wav_csv) as f:
        for line in f.readlines()[1:]:
            aid = line.strip().split()[0]
            if aid not in bl:
                aids.append(aid)

    def load_preds(path):
        return {a["audio_id"]: a["captions"]
                for a in _load_audios(path)}

    g = load_preds(generator_pred)
    eg = load_preds(event_generator_pred)
    r = load_preds(retrieval_pred)
    out = []
    for aid in aids:
        sim = float(g[aid][0]["at_sim"])
        tokens = g[aid][0]["tokens"]
        if float(eg[aid][0]["at_sim"]) > sim:
            sim = float(eg[aid][0]["at_sim"])
            tokens = eg[aid][0]["tokens"]
        if aid in r and float(r[aid][0]["similarity"]) > sim:
            sim = float(r[aid][0]["similarity"])
            tokens = r[aid][0]["tokens"]
        if sim >= min_sim:
            item = dict(g[aid][0])
            item["tokens"] = tokens
            item["at_sim"] = sim
            out.append({"audio_id": aid, "captions": [item]})
    print(f"{len(out)} data left after filtering")
    _dump_audios(out, output)


# --------------------------------------------------------------------------
# AudioCaption-Car corpus (prepare_car.py)
# --------------------------------------------------------------------------

def prepare_car(target: str, dev_label: str, eval_label: str):
    """zh car-corpus label jsons -> {dev,eval}/text.json (prepare_car.py,
    with the label paths as arguments)."""
    import pandas as pd

    def build(label_path: str, cap_id_fmt):
        df = pd.read_json(label_path)
        data: Dict[str, Dict] = {}
        for _, row in df.iterrows():
            fname = Path(row["filename"]).name
            aid = f"car_{fname}"
            entry = data.setdefault(aid, {"raw_name": fname,
                                          "captions": []})
            entry["captions"].append({
                "caption": row["caption"],
                "cap_id": cap_id_fmt(aid, row["caption_index"]),
            })
        return [{"audio_id": aid, "raw_name": v["raw_name"],
                 "captions": v["captions"]} for aid, v in data.items()]

    root = Path(target)
    _dump_audios(build(dev_label, lambda a, i: f"{a}_{i}"),
                 str(root / "dev" / "text.json"))
    _dump_audios(build(eval_label, lambda a, i: str(i)),
                 str(root / "eval" / "text.json"))


# --------------------------------------------------------------------------
# text metadata (prepare_text_metadata/)
# --------------------------------------------------------------------------

def extract_specificity(input_json: str, output_word_condition: str,
                        output_caption_condition: str,
                        sentence_reduce: str = "sum"):
    """-log unigram frequency per word; per-caption sum or mean
    (extract_specificity.py)."""
    import math
    from collections import Counter
    data = _load_audios(input_json)
    counter: Counter = Counter()
    total = 0
    for item in data:
        for cap in item["captions"]:
            toks = cap["tokens"].split()
            counter.update(toks)
            total += len(toks)
    word_cond = {w: -math.log(c / total) for w, c in counter.items()}
    with open(output_word_condition, "w") as f:
        f.write("word\tspecificity\n")
        for w, v in word_cond.items():
            f.write(f"{w}\t{v:.3f}\n")
    with open(output_caption_condition, "w") as f:
        f.write("cap_id\tspecificity\n")
        for item in data:
            for cap in item["captions"]:
                toks = cap["tokens"].split()
                s = sum(word_cond[t] for t in toks)
                if sentence_reduce == "mean":
                    s /= max(len(toks), 1)
                f.write(f"{item['audio_id']}_{cap['cap_id']}\t{s:.3f}\n")


_STOPWORDS = {
    "a", "an", "the", "is", "are", "was", "were", "be", "being", "been",
    "and", "or", "of", "in", "on", "at", "to", "with", "by", "for",
    "as", "it", "its", "this", "that", "then", "while", "there", "some",
    "very", "from", "into", "over", "under", "up", "down", "out",
}


def extract_keyword(annotation: str, output: str,
                    audio_keyword_file: Optional[str] = None,
                    keyword_vocab: Optional[str] = None):
    """Per-caption keyword tsv (keyword/extract_caption_keyword.py).
    Uses stanza lemma+POS when importable; otherwise keeps content
    words by a stopword heuristic.  Keywords are intersected with
    ``keyword_vocab`` (one keyword per line) when given, mirroring the
    reference's keyword_encoder filtering."""
    data = _load_audios(annotation)
    aid_to_kw: Dict[str, List[str]] = {}
    if audio_keyword_file:
        import pandas as pd
        df = pd.read_csv(audio_keyword_file, sep="\t").fillna("")
        aid_to_kw = {r["audio_id"]: [k for k in r["keywords"].split("; ")
                                     if k]
                     for _, r in df.iterrows()}
    vocab = None
    if keyword_vocab:
        vocab = {line.strip() for line in open(keyword_vocab)
                 if line.strip()}

    nlp = None
    try:
        import stanza
        nlp = stanza.Pipeline("en", processors="tokenize,pos,lemma",
                              verbose=False)
    except Exception:
        pass

    def candidates(text: str) -> List[str]:
        if nlp is not None:
            doc = nlp(text)
            return [w.lemma.lower() for s in doc.sentences
                    for w in s.words if w.upos in ("NOUN", "VERB")]
        return [t.lower() for t in text.split()
                if t.lower() not in _STOPWORDS and t.isalpha()]

    with open(output, "w") as f:
        f.write("cap_id\tkeywords\n")
        for item in data:
            tags = aid_to_kw.get(item["audio_id"], [])
            for cap in item["captions"]:
                kws = sorted(set(tags + candidates(
                    cap.get("tokens", cap.get("caption", "")))))
                if vocab is not None:
                    kws = [k for k in kws if k in vocab]
                f.write(f"{item['audio_id']}_{cap['cap_id']}\t"
                        f"{'; '.join(kws)}\n")


def extract_syntax(input_json: str, server: str, parse_result: str,
                   output: str):
    """Constituency/POS metadata via a CoreNLP server
    (extract_syntax.py; thin nltk wrapper, clause levels flattened)."""
    try:
        from nltk.parse import CoreNLPParser
    except ImportError:
        raise SystemExit("extract_syntax needs nltk + a running CoreNLP "
                         "server (reference extract_syntax.py)")
    clause = {"S", "SBAR", "SBARQ", "SINV", "SQ", "ROOT"}

    def children(tree):
        out = []
        for sub in tree:
            if hasattr(sub, "label"):
                if sub.label() in clause:
                    out += children(sub)
                elif sub.label() not in ",.":
                    out.append(sub.label())
        return out

    data = _load_audios(input_json)
    result = {}
    if parse_result == "constituent":
        parser = CoreNLPParser(url=server)
        for item in data:
            for cap in item["captions"]:
                tree = next(parser.raw_parse(cap["caption"]))
                result[f"{item['audio_id']}_{cap['cap_id']}"] = \
                    " ".join(children(tree))
    else:
        parser = CoreNLPParser(url=server, tagtype="pos")
        for item in data:
            for cap in item["captions"]:
                tags = parser.tag(cap["tokens"].split())
                result[f"{item['audio_id']}_{cap['cap_id']}"] = \
                    " ".join(t for _, t in tags)
    with open(output, "w") as f:
        json.dump(result, f, indent=2)


# --------------------------------------------------------------------------
# word2vec (word2vec/create_word_embedding.py; gensim replaced by a JAX
# skip-gram-with-negative-sampling trainer)
# --------------------------------------------------------------------------

def create_word_embedding(vocab_file: str, embed_size: int, output: str,
                          caption_file: Optional[str] = None,
                          pretrained_weights_path: Optional[str] = None,
                          window: int = 5, epochs: int = 10,
                          negatives: int = 5, lr: float = 0.025,
                          seed: int = 0):
    from audiocaption_tpu.data.tokenizer import DictTokenizer
    from audiocaption_tpu.utils.word_embedding import (
        pca_reduce, train_word2vec)
    tokenizer = DictTokenizer(tokenizer_path=vocab_file)
    rng = np.random.RandomState(seed)
    emb = rng.randn(len(tokenizer), embed_size).astype(np.float32)

    if pretrained_weights_path:
        vecs = np.load(pretrained_weights_path, allow_pickle=True)
        if isinstance(vecs, np.lib.npyio.NpzFile):
            words = [str(w) for w in vecs["words"]]
            mat = np.asarray(vecs["vectors"], np.float32)
        else:
            raise SystemExit(
                "pretrained path must be an npz with 'words' + 'vectors'"
                " (binary gensim formats need gensim, absent here)")
        if mat.shape[1] > embed_size:
            mat = pca_reduce(mat, embed_size)
        w2v = dict(zip(words, mat))
        missing = 0
        for word, idx in tokenizer.word2idx.items():
            if word in w2v:
                emb[idx] = w2v[word]
            else:
                missing += 1
        print(f"{missing} vocab words not in pretrained vectors "
              f"(random init)")
    else:
        data = _load_audios(caption_file)
        sentences = [c["tokens"].split() for item in data
                     for c in item["captions"]]
        vectors = train_word2vec(sentences, embed_size, window=window,
                                 epochs=epochs, negatives=negatives,
                                 lr=lr, seed=seed)
        missing = 0
        for word, idx in tokenizer.word2idx.items():
            if word in vectors:
                emb[idx] = vectors[word]
            else:
                missing += 1
        print(f"{missing} vocab words unseen in the corpus (random init)")
    np.save(output, emb)
    print(f"wrote [{emb.shape[0]}, {emb.shape[1]}] embeddings to "
          f"{output}")


# --------------------------------------------------------------------------
# retrieval / analysis utilities
# --------------------------------------------------------------------------

def predict_nrst_ngbr(train_feature: str, train_corpus: str,
                      pred_feature: str, output_json: str, seed: int = 1):
    """Nearest-neighbor caption transfer (predict_nrst_ngbr.py)."""
    import h5py
    random.seed(seed)
    tr_embs, tr_ids = [], []
    with h5py.File(train_feature, "r") as store:
        for aid, emb in store.items():
            tr_embs.append(np.asarray(emb))
            tr_ids.append(aid)
    aid_to_tokens = {a["audio_id"]: [c["tokens"] for c in a["captions"]]
                     for a in _load_audios(train_corpus)}
    pr_embs, pr_ids = [], []
    with h5py.File(pred_feature, "r") as store:
        for aid, emb in store.items():
            pr_embs.append(np.asarray(emb))
            pr_ids.append(aid)
    sim = _cosine(np.stack(pr_embs), np.stack(tr_embs))
    preds = []
    for i, aid in enumerate(pr_ids):
        nn = tr_ids[int(sim[i].argmax())]
        preds.append({"filename": aid,
                      "tokens": random.choice(aid_to_tokens[nn])})
    Path(output_json).parent.mkdir(parents=True, exist_ok=True)
    with open(output_json, "w") as f:
        json.dump({"predictions": preds}, f, indent=4,
                  ensure_ascii=False)


def model_eval_diff(prediction_json: str, caption_json: str, output: str,
                    zh: bool = False):
    """all-references score minus mean leave-one-reference-out score
    (model_eval_diff.py, using our pure-python scorers)."""
    from audiocaption_tpu.data import load_caption_json
    from audiocaption_tpu.metrics import evaluate_captions
    with open(prediction_json) as f:
        preds = json.load(f)["predictions"]
    key2pred = {p["filename"]: [p.get("tokens", p.get("caption", ""))]
                for p in preds}
    key2refs = load_caption_json(caption_json, zh=zh)
    key2refs = {k: v for k, v in key2refs.items() if k in key2pred}
    n_refs = min(len(v) for v in key2refs.values())
    full = evaluate_captions(key2pred, key2refs, zh=zh)
    metrics = ("bleu_4", "cider", "rouge_l")
    loo = {m: 0.0 for m in metrics}
    for i in range(n_refs):
        subset = {k: [v[i]] for k, v in key2refs.items()}
        r = evaluate_captions(key2pred, subset, zh=zh)
        for m in metrics:
            loo[m] += r[m] / n_refs
    with open(output, "w") as f:
        f.write("Diff (all refs - mean single ref):\n")
        for m in metrics:
            f.write(f"{m}: {full[m] - loo[m]:6.3f}\n")
    print(f"wrote {output}")


# --------------------------------------------------------------------------
# small json/csv utilities (python_scripts/utils/)
# --------------------------------------------------------------------------

def pred_to_anno(prediction_input: str, annotation_output: str,
                 wav_csv: str = None):
    """Prediction json -> annotation-format json (pred_to_anno.py):
    each predicted caption becomes the single reference (cap_id "1")."""
    target = None
    if wav_csv:
        with open(wav_csv) as f:
            rows = [ln.split("\t") for ln in f.read().splitlines()[1:]]
        target = {r[0] for r in rows if r}
    with open(prediction_input) as f:
        preds = json.load(f)
    data = []
    if "predictions" in preds:
        for item in preds["predictions"]:
            aid = item["filename"]
            if target is not None and aid not in target:
                continue
            data.append({"audio_id": aid,
                         "captions": [{"cap_id": "1",
                                       "tokens": item["tokens"]}]})
    else:  # flat {audio_id: tokens} dict form (pred_to_anno.py:41-57)
        for aid, tokens in preds.items():
            # the reference unconditionally slices aid[1:12] here — the
            # AudioCaps "Y{youtube_id}.wav" to 11-char-id extraction
            # (pred_to_anno.py:45)
            aid = aid[1:12]
            if target is not None and aid not in target:
                continue
            data.append({"audio_id": aid,
                         "captions": [{"cap_id": "1", "tokens": tokens}]})
    with open(annotation_output, "w") as f:
        json.dump({"audios": data}, f, indent=4, ensure_ascii=False)
    print(f"wrote {len(data)} audios to {annotation_output}")


def concat_anno_json(input_jsons, output_json: str, indent: int = None):
    """Merge annotation jsons; same audio_id -> captions extended
    (concat_anno_json.py)."""
    merged = {}
    for path in input_jsons:
        with open(path, encoding="utf-8") as f:
            audios = json.load(f)["audios"]
        print(f"{path}: {len(audios)} audio clips")
        for item in audios:
            aid = item["audio_id"]
            if aid in merged:
                merged[aid]["captions"].extend(item["captions"])
            else:
                merged[aid] = item
    print(f"new json has {len(merged)} audio clips")
    with open(output_json, "w") as f:
        json.dump({"audios": list(merged.values())}, f, indent=indent,
                  ensure_ascii=False)


def concat_pred_json(input_jsons, output_json: str):
    """Merge prediction jsons; same filename -> token lists extended
    (concat_pred_json.py)."""
    merged = {}
    for path in input_jsons:
        with open(path, encoding="utf-8") as f:
            for item in json.load(f)["predictions"]:
                tokens = item["tokens"]
                if isinstance(tokens, str):
                    tokens = [tokens]
                merged.setdefault(item["filename"], []).extend(tokens)
    data = [{"filename": k, "tokens": v} for k, v in merged.items()]
    with open(output_json, "w") as f:
        json.dump({"predictions": data}, f, indent=4, ensure_ascii=False)


def prepare_wav_csv(audio_directory: str, output_csv: str,
                    recursive: bool = False, prefix: str = ""):
    """Scan a directory for audio files -> wav csv [audio_id, file_name]
    (prepare_wav_csv.py)."""
    root = Path(audio_directory)
    names = root.rglob("*") if recursive else root.iterdir()
    with open(output_csv, "w") as f:
        f.write("audio_id\tfile_name\n")
        n = 0
        for p in sorted(names):
            if p.suffix in (".wav", ".mp3", ".flac"):
                f.write(f"{prefix + p.name}\t{p.absolute()}\n")
                n += 1
    print(f"wrote {n} rows to {output_csv}")


def wavcsv_from_textjson(annotation: str, waveform_csv: str, output: str):
    """Subset a big waveform csv to the audio ids in an annotation json
    (wavcsv_from_textjson.py)."""
    aid_to_h5 = {}
    with open(waveform_csv) as f:
        rows = f.read().splitlines()
    for ln in rows[1:]:
        parts = ln.split("\t")
        if len(parts) >= 2:
            aid_to_h5[parts[0]] = parts[1]
    with open(annotation) as f:
        audios = json.load(f)["audios"]
    with open(output, "w") as f:
        f.write("audio_id\thdf5_path\n")
        for item in audios:
            aid = item["audio_id"]
            f.write(f"{aid}\t{aid_to_h5[aid]}\n")
    print(f"wrote {len(audios)} rows to {output}")


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(prog="audiocaption_tpu.cli.data_tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("speed_perturb")
    s.add_argument("input_dir")
    s.add_argument("output_dir")
    s.add_argument("--speeds", type=float, nargs="+", default=[0.9, 1.1])
    s.add_argument("--sr", type=int, default=16000)
    s.add_argument("--compute", action="store_true")

    s = sub.add_parser("back_translate")
    s.add_argument("input")
    s.add_argument("output")
    s.add_argument("--batch_size", type=int, default=32)

    s = sub.add_parser("subset_concat")
    s.add_argument("set_a")
    s.add_argument("set_b")
    s.add_argument("subset_a_output")
    s.add_argument("all_output")
    s.add_argument("--a_percent", type=float, required=True)
    s.add_argument("--seed", type=int, default=1)
    s.add_argument("--total_number", type=int, default=None)

    s = sub.add_parser("text_similarity")
    s.add_argument("input_label")
    s.add_argument("text_embedding")
    s.add_argument("output_label")
    s.add_argument("--thresholds", type=float, nargs=2,
                   default=[0.9, 1.0])
    s.add_argument("--max_caption_aug", type=int, default=None)
    s.add_argument("--nearest", action="store_true")
    s.add_argument("--exclude_real", action="store_true")

    s = sub.add_parser("retrieve_similarity")
    s.add_argument("annotation")
    s.add_argument("sim_store")
    s.add_argument("output")
    s.add_argument("--thresholds", type=float, nargs=2,
                   default=[0.0, 1.0])
    s.add_argument("--max_caption_aug", type=int, default=None)
    s.add_argument("--nearest", action="store_true")
    s.add_argument("--exclude_real", action="store_true")

    s = sub.add_parser("audio_similarity")
    s.add_argument("ref_embedding")
    s.add_argument("ref_caption")
    s.add_argument("new_embedding")
    s.add_argument("output")
    s.add_argument("--threshold", type=float, default=0.95)

    s = sub.add_parser("filter_new_audio_aug")
    s.add_argument("wav_csv")
    s.add_argument("generator_pred")
    s.add_argument("event_generator_pred")
    s.add_argument("retrieval_pred")
    s.add_argument("output")
    s.add_argument("--blacklist", default=None)
    s.add_argument("--min_sim", type=float, default=0.5)

    s = sub.add_parser("prepare_car")
    s.add_argument("target")
    s.add_argument("--dev_label", required=True)
    s.add_argument("--eval_label", required=True)

    s = sub.add_parser("extract_specificity")
    s.add_argument("input_json")
    s.add_argument("output_word_condition")
    s.add_argument("output_caption_condition")
    s.add_argument("--sentence_reduce", default="sum",
                   choices=["mean", "sum"])

    s = sub.add_parser("extract_keyword")
    s.add_argument("annotation")
    s.add_argument("output")
    s.add_argument("--audio_keyword_file", default=None)
    s.add_argument("--keyword_vocab", default=None)

    s = sub.add_parser("extract_syntax")
    s.add_argument("input_json")
    s.add_argument("server")
    s.add_argument("parse_result", choices=["constituent", "pos"])
    s.add_argument("output")

    s = sub.add_parser("create_word_embedding")
    s.add_argument("vocab_file")
    s.add_argument("embed_size", type=int)
    s.add_argument("output")
    s.add_argument("--caption_file", default=None)
    s.add_argument("--pretrained_weights_path", default=None)
    s.add_argument("--window", type=int, default=5)
    s.add_argument("--epochs", type=int, default=10)
    s.add_argument("--negatives", type=int, default=5)
    s.add_argument("--lr", type=float, default=0.025)

    s = sub.add_parser("predict_nrst_ngbr")
    s.add_argument("train_feature")
    s.add_argument("train_corpus")
    s.add_argument("pred_feature")
    s.add_argument("output_json")

    s = sub.add_parser("model_eval_diff")
    s.add_argument("prediction_json")
    s.add_argument("caption_json")
    s.add_argument("output")
    s.add_argument("--zh", action="store_true")

    s = sub.add_parser("pred_to_anno")
    s.add_argument("prediction_input")
    s.add_argument("annotation_output")
    s.add_argument("--wav_csv", default=None)

    s = sub.add_parser("concat_anno_json")
    s.add_argument("input_jsons", nargs="+")
    s.add_argument("output_json")
    s.add_argument("--indent", type=int, default=None)

    s = sub.add_parser("concat_pred_json")
    s.add_argument("input_jsons", nargs="+")
    s.add_argument("output_json")

    s = sub.add_parser("prepare_wav_csv")
    s.add_argument("audio_directory")
    s.add_argument("output_csv")
    s.add_argument("--recursive", action="store_true")
    s.add_argument("--prefix", default="")

    s = sub.add_parser("wavcsv_from_textjson")
    s.add_argument("annotation")
    s.add_argument("waveform_csv")
    s.add_argument("output")

    args = vars(p.parse_args(argv))
    cmd = args.pop("cmd")
    globals()[cmd](**args)


if __name__ == "__main__":
    main()
