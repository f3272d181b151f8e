from audiocaption_tpu.metrics.tokenize import ptb_tokenize
from audiocaption_tpu.metrics.bleu import corpus_bleu
from audiocaption_tpu.metrics.rouge import rouge_l
from audiocaption_tpu.metrics.cider import CiderD
from audiocaption_tpu.metrics.eval import evaluate_captions
from audiocaption_tpu.metrics.diversity import diversity_metrics
