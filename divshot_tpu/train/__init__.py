from divshot_tpu.train.trainer import Trainer, TrainState  # noqa: F401
