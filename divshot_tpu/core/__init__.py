from divshot_tpu.core.config import TrainConfig, auto_tune_config  # noqa: F401
