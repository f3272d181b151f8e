from audiocaption_tpu.ops.masking import (
    length_mask,
    mean_with_lens,
    max_with_lens,
    masked_softmax,
)
from audiocaption_tpu.ops.frontend import (
    MelConfig,
    LogMelFrontend,
    mel_filterbank,
    hann_window,
    frame_signal,
    amplitude_to_db,
    CNN14_MEL_32K,
    CNN14_MEL_16K,
    EFFB2_MEL_16K,
)
