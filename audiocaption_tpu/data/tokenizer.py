"""Word-level caption tokenizer with reference parity
(captioning/datasets/text_tokenizer.py:8-107).

Special ids are fixed by construction order: <pad>=0, <start>=1,
<end>=2, <unk>=3 (text_tokenizer.py:16-19).  ``state_dict`` is the raw
word2idx mapping, so vocab.pkl files produced by the reference load
directly, and tokenizer state stored inside reference checkpoints
(train_eval/base.py:239-240) round-trips.
"""

from __future__ import annotations

import json
import pickle
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def pad_sequence_list(seqs: List[np.ndarray], pad_value: int):
    """[arrays of varying length] -> (padded [N, Lmax], lens [N])
    (train_util.py:24-31)."""
    lens = np.asarray([len(s) for s in seqs], np.int32)
    out = np.full((len(seqs), int(lens.max())), pad_value, np.int64)
    for i, s in enumerate(seqs):
        out[i, :len(s)] = s
    return out, lens


class DictTokenizer:

    def __init__(self, tokenizer_path: Optional[str] = None,
                 max_length: int = 20) -> None:
        self.word2idx: Dict[str, int] = {}
        self.idx2word: Dict[int, str] = {}
        self.idx = 0
        for tok in ("<pad>", "<start>", "<end>", "<unk>"):
            self.add_word(tok)
        self.loaded = False
        if tokenizer_path is not None and Path(tokenizer_path).exists():
            with open(tokenizer_path, "rb") as f:
                self.load_state_dict(pickle.load(f))
            self.loaded = True
        self.bos = self.word2idx["<start>"]
        self.eos = self.word2idx["<end>"]
        self.pad = self.word2idx["<pad>"]
        self.max_length = max_length

    def add_word(self, word: str):
        if word not in self.word2idx:
            self.word2idx[word] = self.idx
            self.idx2word[self.idx] = word
            self.idx += 1

    def encode_word(self, word: str) -> int:
        return self.word2idx.get(word, self.word2idx["<unk>"])

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        assert isinstance(texts, list), "the input must be List[str]"
        batch = []
        for text in texts:
            tokens = [self.encode_word(t)
                      for t in text.split()][:self.max_length]
            batch.append(np.asarray([self.bos] + tokens + [self.eos]))
        caps, cap_lens = pad_sequence_list(batch, self.pad)
        return {"cap": caps, "cap_len": cap_lens}

    def decode(self, batch_token_ids) -> List[str]:
        out = []
        for token_ids in batch_token_ids:
            tokens = []
            for tid in token_ids:
                tid = int(tid)
                if tid == self.eos:
                    break
                if tid == self.bos:
                    continue
                tokens.append(self.idx2word[tid])
            out.append(" ".join(tokens))
        return out

    def __len__(self):
        return len(self.word2idx)

    def state_dict(self) -> Dict[str, int]:
        return self.word2idx

    def load_state_dict(self, state_dict: Dict[str, int]):
        self.word2idx = dict(state_dict)
        self.idx2word = {i: w for w, i in self.word2idx.items()}
        self.idx = len(self.word2idx)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self.state_dict(), f)


class HuggingfaceTokenizer:
    """AutoTokenizer adapter emitting the same cap/cap_len contract
    (text_tokenizer.py:81-107)."""

    def __init__(self, model_name_or_path: str, max_length: int) -> None:
        from transformers import AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.max_length = max_length
        self.bos = self.tokenizer.bos_token_id
        self.eos = self.tokenizer.eos_token_id
        self.pad = self.tokenizer.pad_token_id
        self.loaded = True

    def __call__(self, texts: List[str]) -> Dict[str, np.ndarray]:
        assert isinstance(texts, list)
        enc = self.tokenizer(texts, padding=True, truncation=True,
                             max_length=self.max_length, return_tensors="np")
        return {"cap": enc["input_ids"].astype(np.int64),
                "cap_len": enc["attention_mask"].sum(1).astype(np.int32)}

    def decode(self, batch_token_ids) -> List[str]:
        return self.tokenizer.batch_decode(batch_token_ids,
                                           skip_special_tokens=True)


def build_vocab(caption_json: str, threshold: int = 1,
                output_path: Optional[str] = None,
                max_length: int = 20) -> DictTokenizer:
    """Build a DictTokenizer vocabulary from a caption json
    ({"audios": [{audio_id, captions: [{caption|tokens, cap_id}]}]}),
    keeping words with count >= threshold (the reference's
    build_custom_tokenizer flow, python_scripts/utils/
    build_custom_tokenizer.py)."""
    with open(caption_json) as f:
        data = json.load(f)
    counter: Counter = Counter()
    for audio in data["audios"]:
        for cap in audio["captions"]:
            text = cap.get("tokens", cap.get("caption", ""))
            counter.update(text.split())
    tok = DictTokenizer(max_length=max_length)
    for word, count in sorted(counter.items()):
        if count >= threshold:
            tok.add_word(word)
    tok.loaded = True
    if output_path:
        tok.save(output_path)
    return tok
