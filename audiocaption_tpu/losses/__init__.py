from audiocaption_tpu.losses.loss import (
    cross_entropy_loss,
    label_smoothing_loss,
    masked_token_loss,
    build_loss,
)
