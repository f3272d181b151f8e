from audiocaption_tpu.decoding.engine import (
    SpecialTokens,
    stepwise_decode,
    beam_search,
    diverse_beam_search,
    expand_to_beams,
    sample_next_word,
)
