from audiocaption_tpu.training.trainer import (
    TrainState,
    create_train_state,
    make_train_step,
)
from audiocaption_tpu.training.swa import swa_init, swa_update
