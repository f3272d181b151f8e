from audiocaption_tpu.data.tokenizer import (
    DictTokenizer, HuggingfaceTokenizer, build_vocab)
from audiocaption_tpu.data.collate import (
    VarLenPadCollate, TextCollate, pad_sequences, bucket_length)
from audiocaption_tpu.data.dataset import (
    InferenceDataset, CaptionDataset, read_wav_csv, load_caption_json)
