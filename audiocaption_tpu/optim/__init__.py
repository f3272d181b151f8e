from audiocaption_tpu.optim.schedules import (
    exponential_decay_with_warmup,
    noam_schedule,
    cosine_with_warmup,
    build_schedule,
)
