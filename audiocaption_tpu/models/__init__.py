from audiocaption_tpu.models.captioner import Captioner, generate
from audiocaption_tpu.models.cnn14 import Cnn14Encoder, convert_cnn14
from audiocaption_tpu.models.effb2 import EfficientNetB2, convert_effb2
from audiocaption_tpu.models.rnn_encoder import (
    RnnEncoder, Cnn14RnnEncoder, convert_cnn14_rnn, embedding_pooling)
from audiocaption_tpu.models.rnn_decoder import (
    BahAttnCatFcDecoder, TemporalBahAttnDecoder, Seq2SeqAttention,
    convert_bahattn_decoder)
from audiocaption_tpu.models.transformer_decoder import (
    TransformerDecoder, convert_transformer_decoder)
from audiocaption_tpu.models.sed import (
    Cnn8RnnSedModel, convert_cnn8rnn, framewise_to_temporal_tags)
from audiocaption_tpu.models import zoo
