from mamdr_tpu.train.state import TrainState
from mamdr_tpu.train.trainer import Trainer

__all__ = ["TrainState", "Trainer"]
