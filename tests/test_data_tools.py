"""Offline data tooling (cli/data_tools.py) on synthetic corpora."""

import json
import pickle
from pathlib import Path

import numpy as np
import pytest

from audiocaption_tpu.cli import data_tools as DT


@pytest.fixture()
def corpus(tmp_path):
    caps = [("aud0", ["a dog barks loudly", "dog barking sound"]),
            ("aud1", ["water flows down a stream"]),
            ("aud2", ["someone speaks quietly"]),
            ("aud3", ["music plays softly"])]
    audios = [{"audio_id": aid,
               "captions": [{"caption": c, "tokens": c,
                             "cap_id": str(i + 1)}
                            for i, c in enumerate(cs)]}
              for aid, cs in caps]
    p = tmp_path / "text.json"
    json.dump({"audios": audios}, open(p, "w"))
    return tmp_path, p, audios


def test_subset_concat(corpus, tmp_path):
    root, p, audios = corpus
    DT.subset_concat(str(p), str(p), str(tmp_path / "suba.json"),
                     str(tmp_path / "all.json"), a_percent=0.5)
    sub = json.load(open(tmp_path / "suba.json"))["audios"]
    alls = json.load(open(tmp_path / "all.json"))["audios"]
    assert len(sub) == 2 and len(alls) == 4


def test_extract_specificity(corpus, tmp_path):
    root, p, audios = corpus
    wc = tmp_path / "word.tsv"
    cc = tmp_path / "cap.tsv"
    DT.extract_specificity(str(p), str(wc), str(cc))
    lines = wc.read_text().strip().splitlines()
    assert lines[0] == "word\tspecificity"
    words = {l.split("\t")[0]: float(l.split("\t")[1])
             for l in lines[1:]}
    # "dog" appears twice -> lower specificity than "music" (once)
    assert words["dog"] < words["music"]
    cap_lines = cc.read_text().strip().splitlines()[1:]
    assert len(cap_lines) == 5
    assert cap_lines[0].startswith("aud0_1\t")


def test_extract_keyword(corpus, tmp_path):
    root, p, audios = corpus
    out = tmp_path / "kw.tsv"
    DT.extract_keyword(str(p), str(out))
    lines = out.read_text().strip().splitlines()[1:]
    kw = dict(l.split("\t") for l in lines)
    assert "dog" in kw["aud0_1"] and "barks" in kw["aud0_1"]
    assert "a" not in kw["aud0_1"].split("; ")


def test_speed_perturb_compute(corpus, tmp_path):
    import h5py
    root, p, audios = corpus
    sr = 8000
    h5p = tmp_path / "wav.h5"
    with h5py.File(h5p, "w") as f:
        for a in audios:
            f[a["audio_id"]] = np.random.RandomState(0).randn(
                sr).astype(np.float32)
    with open(tmp_path / "wav.csv", "w") as f:
        f.write("audio_id\thdf5_path\n")
        for a in audios:
            f.write(f"{a['audio_id']}\t{h5p}\n")
    out = tmp_path / "sp"
    DT.speed_perturb(str(tmp_path), str(out), speeds=[0.9, 1.1],
                     compute=True)
    with h5py.File(out / "waveform_sp.h5", "r") as f:
        slow = np.asarray(f["sp0.9-aud0"])
        fast = np.asarray(f["sp1.1-aud0"])
    assert abs(len(slow) - sr / 0.9) < 20
    assert abs(len(fast) - sr / 1.1) < 20
    text = json.load(open(out / "text.json"))["audios"]
    assert len(text) == 4 + 8


def test_text_similarity(corpus, tmp_path):
    import h5py
    root, p, audios = corpus
    # embeddings: aud0_1 ~ aud2_1 near-identical, others orthogonal
    emb = tmp_path / "emb.h5"
    rng = np.random.RandomState(0)
    base = {"aud0_1": np.array([1.0, 0, 0]),
            "aud0_2": np.array([0, 1.0, 0]),
            "aud1_1": np.array([0, 0, 1.0]),
            "aud2_1": np.array([0.99, 0.02, 0]),
            "aud3_1": np.array([0, 0.98, 0.1])}
    with h5py.File(emb, "w") as f:
        for k, v in base.items():
            f[k] = v.astype(np.float32)
    out = tmp_path / "aug.json"
    DT.text_similarity(str(p), str(emb), str(out),
                       thresholds=(0.9, 1.0))
    data = {a["audio_id"]: a for a in json.load(open(out))["audios"]}
    aug_caps = [c for c in data["aud0"]["captions"]
                if "textaug" in str(c["cap_id"])]
    assert len(aug_caps) >= 1
    assert aug_caps[0]["caption"] == "someone speaks quietly"


def test_predict_nrst_ngbr(corpus, tmp_path):
    import h5py
    root, p, audios = corpus
    tr = tmp_path / "train_emb.h5"
    pr = tmp_path / "pred_emb.h5"
    with h5py.File(tr, "w") as f:
        f["aud0"] = np.array([1.0, 0], np.float32)
        f["aud1"] = np.array([0, 1.0], np.float32)
    with h5py.File(pr, "w") as f:
        f["new0"] = np.array([0.9, 0.1], np.float32)
    out = tmp_path / "nn.json"
    DT.predict_nrst_ngbr(str(tr), str(p), str(pr), str(out))
    preds = json.load(open(out))["predictions"]
    assert preds[0]["filename"] == "new0"
    assert "dog" in preds[0]["tokens"]


def test_model_eval_diff(corpus, tmp_path):
    root, p, audios = corpus
    preds = {"predictions": [
        {"filename": a["audio_id"],
         "tokens": a["captions"][0]["caption"]} for a in audios]}
    pp = tmp_path / "pred.json"
    json.dump(preds, open(pp, "w"))
    out = tmp_path / "diff.txt"
    DT.model_eval_diff(str(pp), str(p), str(out))
    txt = out.read_text()
    assert "cider" in txt and "bleu_4" in txt


def test_train_word2vec_similarity():
    """Co-occurring words end up closer than non-co-occurring ones."""
    from audiocaption_tpu.utils.word_embedding import train_word2vec
    rng = np.random.RandomState(0)
    sentences = []
    for _ in range(300):
        sentences.append(["dog", "barks"] * 3)
        sentences.append(["water", "flows"] * 3)
    vecs = train_word2vec(sentences, 16, window=2, epochs=8, seed=0)
    def cos(a, b):
        return float(np.dot(a, b) /
                     (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos(vecs["dog"], vecs["barks"]) > cos(vecs["dog"],
                                                 vecs["flows"])


def test_create_word_embedding_cli(corpus, tmp_path):
    from audiocaption_tpu.data import DictTokenizer
    root, p, audios = corpus
    tok = DictTokenizer()
    for a in audios:
        for c in a["captions"]:
            for w in c["tokens"].split():
                tok.add_word(w)
    vp = tmp_path / "vocab.pkl"
    pickle.dump(tok.state_dict(), open(vp, "wb"))
    out = tmp_path / "emb.npy"
    DT.create_word_embedding(str(vp), 8, str(out), caption_file=str(p),
                             epochs=2)
    emb = np.load(out)
    assert emb.shape == (len(tok), 8)


def test_audio_similarity(corpus, tmp_path):
    import h5py
    root, p, audios = corpus
    ref = tmp_path / "ref_emb.h5"
    new = tmp_path / "new_emb.h5"
    with h5py.File(ref, "w") as f:
        f["aud0"] = np.array([1.0, 0], np.float32)
        f["aud1"] = np.array([0, 1.0], np.float32)
    with h5py.File(new, "w") as f:
        f["fresh0"] = np.array([0.999, 0.01], np.float32)  # ~aud0
        f["fresh1"] = np.array([0.7, 0.7], np.float32)     # below thr
    out = tmp_path / "aug_sim.json"
    DT.audio_similarity(str(ref), str(p), str(new), str(out),
                        threshold=0.95)
    data = json.load(open(out))["audios"]
    assert len(data) == 1 and data[0]["audio_id"] == "fresh0"
    assert "dog" in data[0]["captions"][0]["caption"]


def test_filter_new_audio_aug(corpus, tmp_path):
    root, p, audios = corpus
    with open(tmp_path / "wav.csv", "w") as f:
        f.write("audio_id\thdf5_path\nnew0\tx\nnew1\tx\n")

    def dump(path, sims, key="at_sim"):
        json.dump({"audios": [
            {"audio_id": aid,
             "captions": [{"tokens": f"cap {aid} {key}", key: s,
                           "cap_id": "1"}]}
            for aid, s in sims.items()]}, open(path, "w"))
    dump(tmp_path / "g.json", {"new0": 0.6, "new1": 0.2})
    dump(tmp_path / "eg.json", {"new0": 0.4, "new1": 0.3})
    dump(tmp_path / "r.json", {"new0": 0.1, "new1": 0.45},
         key="similarity")
    out = tmp_path / "filtered.json"
    DT.filter_new_audio_aug(str(tmp_path / "wav.csv"),
                            str(tmp_path / "g.json"),
                            str(tmp_path / "eg.json"),
                            str(tmp_path / "r.json"), str(out))
    data = json.load(open(out))["audios"]
    # new0 passes (0.6 >= 0.5); new1's best is 0.45 -> dropped
    assert [a["audio_id"] for a in data] == ["new0"]


def test_pred_to_anno_and_concat(corpus, tmp_path):
    root, p, audios = corpus
    pred = {"predictions": [{"filename": "aud0", "tokens": "a dog barks"},
                            {"filename": "aud1", "tokens": "water flows"}]}
    pp = tmp_path / "pred.json"
    json.dump(pred, open(pp, "w"))
    anno = tmp_path / "anno.json"
    DT.pred_to_anno(str(pp), str(anno))
    out = json.load(open(anno))["audios"]
    assert out[0]["captions"][0] == {"cap_id": "1", "tokens": "a dog barks"}

    # concat: annotation merge extends captions of shared ids
    merged = tmp_path / "merged.json"
    DT.concat_anno_json([str(p), str(anno)], str(merged))
    m = {a["audio_id"]: a for a in json.load(open(merged))["audios"]}
    assert len(m["aud0"]["captions"]) == 3          # 2 originals + 1 pred
    assert len(m) == 4

    # prediction merge extends token lists of shared filenames
    mp = tmp_path / "mpred.json"
    DT.concat_pred_json([str(pp), str(pp)], str(mp))
    preds = {x["filename"]: x["tokens"]
             for x in json.load(open(mp))["predictions"]}
    assert preds["aud0"] == ["a dog barks", "a dog barks"]


def test_prepare_wav_csv_and_subset(corpus, tmp_path):
    root, p, audios = corpus
    d = tmp_path / "wavs"
    (d / "sub").mkdir(parents=True)
    for aid in ("aud0", "aud1", "aud2", "aud3"):
        (d / f"{aid}.wav").write_bytes(b"")
    (d / "sub" / "extra.flac").write_bytes(b"")
    (d / "notes.txt").write_text("skip me")

    out = tmp_path / "wav.csv"
    DT.prepare_wav_csv(str(d), str(out))
    rows = out.read_text().splitlines()
    assert rows[0] == "audio_id\tfile_name"
    assert len(rows) == 5                            # 4 wavs, no txt
    DT.prepare_wav_csv(str(d), str(out), recursive=True, prefix="x_")
    rows = out.read_text().splitlines()
    assert len(rows) == 6 and rows[1].startswith("x_")

    # wavcsv_from_textjson subsets by annotation ids
    big = tmp_path / "big.csv"
    big.write_text("audio_id\thdf5_path\n" + "".join(
        f"aud{i}\t/h5/part{i}.h5\n" for i in range(10)))
    sub = tmp_path / "subset.csv"
    DT.wavcsv_from_textjson(str(p), str(big), str(sub))
    rows = sub.read_text().splitlines()
    assert rows[1:] == [f"aud{i}\t/h5/part{i}.h5" for i in range(4)]
