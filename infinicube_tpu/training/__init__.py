from infinicube_tpu.training.state import TrainState, TrainConfig  # noqa: F401
