from audiocaption_tpu.utils.config import (
    load_config, merge_dicts, parse_overrides, build_model_from_config)
