"""Data pipeline tests: tokenizer parity, collate, HDF5 datasets."""

import json
import pickle

import numpy as np
import pytest

from audiocaption_tpu.data import (
    DictTokenizer, VarLenPadCollate, TextCollate, build_vocab,
    InferenceDataset, CaptionDataset, read_wav_csv, load_caption_json,
    pad_sequences, bucket_length)
from audiocaption_tpu.data.dataset import resample


def test_tokenizer_special_ids():
    tok = DictTokenizer()
    assert tok.word2idx["<pad>"] == 0
    assert tok.word2idx["<start>"] == 1
    assert tok.word2idx["<end>"] == 2
    assert tok.word2idx["<unk>"] == 3


def test_tokenizer_encode_decode_roundtrip():
    tok = DictTokenizer(max_length=20)
    for w in "a dog barks loudly".split():
        tok.add_word(w)
    out = tok(["a dog barks", "a dog barks loudly unknownword"])
    assert out["cap"].shape[0] == 2
    np.testing.assert_array_equal(out["cap_len"], [5, 7])
    # bos/eos framing
    assert out["cap"][0, 0] == tok.bos
    assert out["cap"][0, 4] == tok.eos
    assert out["cap"][0, 5] == tok.pad  # padded tail
    # unknown word -> <unk>
    assert out["cap"][1, 5] == tok.word2idx["<unk>"]
    dec = tok.decode(out["cap"])
    assert dec[0] == "a dog barks"
    assert dec[1] == "a dog barks loudly <unk>"


def test_tokenizer_truncation():
    tok = DictTokenizer(max_length=3)
    out = tok(["one two three four five"])
    assert out["cap_len"][0] == 5  # 3 tokens + bos + eos


def test_tokenizer_state_dict_pickle_compat(tmp_path):
    tok = DictTokenizer()
    tok.add_word("hello")
    p = tmp_path / "vocab.pkl"
    # reference stores the raw word2idx dict
    with open(p, "wb") as f:
        pickle.dump(tok.state_dict(), f)
    tok2 = DictTokenizer(str(p))
    assert tok2.loaded
    assert tok2.word2idx == tok.word2idx
    assert len(tok2) == 5


def test_build_vocab(tmp_path):
    data = {"audios": [
        {"audio_id": "a", "captions": [
            {"tokens": "a dog barks", "cap_id": "1"},
            {"tokens": "a dog runs", "cap_id": "2"}]},
    ]}
    p = tmp_path / "text.json"
    p.write_text(json.dumps(data))
    tok = build_vocab(str(p), threshold=2)
    assert "dog" in tok.word2idx and "a" in tok.word2idx
    assert "barks" not in tok.word2idx  # below threshold


def test_pad_sequences_and_bucket():
    a, lens = pad_sequences([np.ones(5, np.float32), np.ones(3, np.float32)],
                            bucket=8)
    assert a.shape == (2, 8)
    np.testing.assert_array_equal(lens, [5, 3])
    assert bucket_length(9, 8) == 16


def test_varlen_collate_feature_rows_ignore_sample_bucket():
    # Precomputed-feature items are [T, D]; the sample-denominated wav
    # bucket (16000 = 1 s) must NOT apply to them or every feature
    # batch pads to 16000 frames (regression: M2 eval built a
    # 16000x16000 attention and OOM'd HBM).  Multi-dim rows bucket by
    # feature_bucket frames instead.
    items = [{"wav": np.ones((31, 8), np.float32), "audio_id": "x"},
             {"wav": np.ones((25, 8), np.float32), "audio_id": "y"}]
    c = VarLenPadCollate(pad_keys=["wav"], buckets={"wav": 16000},
                         feature_bucket=16)
    out = c(items)
    assert out["wav"].shape == (2, 32, 8)
    np.testing.assert_array_equal(out["wav_len"], [31, 25])
    # 1-D waveforms still honour the sample bucket
    items1d = [{"wav": np.ones(5, np.float32), "audio_id": "x"}]
    out1d = VarLenPadCollate(pad_keys=["wav"], buckets={"wav": 8})(items1d)
    assert out1d["wav"].shape == (1, 8)


def test_varlen_collate():
    items = [{"wav": np.ones(5, np.float32), "audio_id": "x"},
             {"wav": np.ones(9, np.float32), "audio_id": "y"}]
    c = VarLenPadCollate(pad_keys=["wav"])
    out = c(items)
    assert out["wav"].shape == (2, 9)
    np.testing.assert_array_equal(out["wav_len"], [5, 9])
    assert list(out["audio_id"]) == ["x", "y"]


def test_text_collate_sorts_and_tokenizes():
    tok = DictTokenizer()
    for w in "a b c".split():
        tok.add_word(w)
    items = [{"wav": np.ones(4, np.float32), "cap": "a b"},
             {"wav": np.ones(6, np.float32), "cap": "a b c a"}]
    c = TextCollate(tok, pad_keys=["wav", "cap"], sort_key="cap")
    out = c(items)
    # sorted by caption length descending
    np.testing.assert_array_equal(out["cap_len"], [6, 4])
    assert out["wav"].shape == (2, 6)
    np.testing.assert_array_equal(out["wav_len"], [6, 4])


def test_text_collate_cap_bucket_fixes_program_shape():
    """buckets[cap] rounds the tokenized cap length up so variable-
    length corpora share one train-step program instead of one per
    batch-max length (the tokenizer pads to batch max, bypassing
    pad_sequences buckets)."""
    tok = DictTokenizer()
    for w in "a b c".split():
        tok.add_word(w)
    c = TextCollate(tok, pad_keys=["wav", "cap"], sort_key="cap",
                    buckets={"cap": 22})
    for caps in (["a b", "a b c a"], ["a"], ["a b c a b c a b"]):
        out = c([{"wav": np.ones(4, np.float32), "cap": t}
                 for t in caps])
        assert out["cap"].shape[1] == 22          # one shape for all
        # padded tail is the tokenizer's pad id; lengths untouched
        assert (out["cap"][0, out["cap_len"][0]:] == tok.pad).all()


@pytest.fixture
def h5_dataset(tmp_path):
    import h5py
    h5p = tmp_path / "waveform.h5"
    rng = np.random.RandomState(0)
    wavs = {"aud1": rng.randn(44100).astype(np.float32),
            "aud2": rng.randn(22050).astype(np.float32)}
    with h5py.File(h5p, "w") as f:
        for k, v in wavs.items():
            f[k] = v
    csv = tmp_path / "wav.csv"
    csv.write_text("audio_id\thdf5_path\naud1\t%s\naud2\t%s\n"
                   % (h5p, h5p))
    text = tmp_path / "text.json"
    text.write_text(json.dumps({"audios": [
        {"audio_id": "aud1", "captions": [
            {"tokens": "a dog barks", "caption": "A dog barks.",
             "cap_id": "1"},
            {"tokens": "water flows", "caption": "Water flows!",
             "cap_id": "2"}]},
        {"audio_id": "aud2", "captions": [
            {"tokens": "rain falls", "caption": "Rain falls",
             "cap_id": "1"}]},
    ]}))
    return tmp_path, wavs


def test_inference_dataset(h5_dataset):
    tmp_path, wavs = h5_dataset
    ds = InferenceDataset({"wav": str(tmp_path / "wav.csv")},
                          orig_sr=44100, target_sr=22050)
    assert len(ds) == 2
    item = ds[0]
    assert item["audio_id"] == "aud1"
    assert abs(len(item["wav"]) - 22050) <= 1   # resampled 44.1k -> 22.05k


def test_caption_dataset(h5_dataset):
    tmp_path, wavs = h5_dataset
    ds = CaptionDataset({"wav": str(tmp_path / "wav.csv")},
                        caption=str(tmp_path / "text.json"))
    assert len(ds) == 3  # one item per (audio, caption)
    item = ds[0]
    assert item["cap"] == "a dog barks"
    assert item["wav"].shape == wavs["aud1"].shape


def test_caption_dataset_fixed_duration(h5_dataset):
    tmp_path, _ = h5_dataset
    ds = CaptionDataset({"wav": str(tmp_path / "wav.csv")},
                        caption=str(tmp_path / "text.json"),
                        orig_sr=44100, target_sr=44100, audio_duration=0.5)
    for i in range(len(ds)):
        assert len(ds[i]["wav"]) == 22050


def test_load_caption_json(h5_dataset):
    tmp_path, _ = h5_dataset
    refs = load_caption_json(str(tmp_path / "text.json"))
    assert refs["aud1"] == ["A dog barks.", "Water flows!"]


def test_resample_identity():
    x = np.random.RandomState(1).randn(1000).astype(np.float32)
    assert resample(x, 16000, 16000) is x
    y = resample(x, 16000, 32000)
    assert abs(len(y) - 2000) <= 2


def test_wav_caption_dataset(tmp_path):
    from scipy.io import wavfile
    from audiocaption_tpu.data.dataset import WavCaptionDataset
    rng = np.random.RandomState(0)
    wav = (rng.randn(8000) * 0.1).astype(np.float32)
    wavfile.write(tmp_path / "a.wav", 8000, wav)
    (tmp_path / "wav.csv").write_text(
        f"audio_id\tfile_name\naud1\t{tmp_path / 'a.wav'}\n")
    (tmp_path / "text.json").write_text(json.dumps({"audios": [
        {"audio_id": "aud1",
         "captions": [{"tokens": "a b", "cap_id": "1"}]}]}))
    ds = WavCaptionDataset({"wav": str(tmp_path / "wav.csv")},
                           caption=str(tmp_path / "text.json"),
                           orig_sr=8000, target_sr=16000)
    item = ds[0]
    assert abs(len(item["wav"]) - 16000) <= 2
    np.testing.assert_allclose(item["wav"][:10], wav[:10].repeat(2)[:10],
                               atol=0.2)  # rough resample sanity
