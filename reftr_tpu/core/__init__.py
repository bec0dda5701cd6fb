from reftr_tpu.core.config import (
    BertConfig,
    DataConfig,
    LossConfig,
    MeshConfig,
    ModelConfig,
    RefTRConfig,
    TrainConfig,
)

__all__ = [
    "BertConfig",
    "DataConfig",
    "LossConfig",
    "MeshConfig",
    "ModelConfig",
    "RefTRConfig",
    "TrainConfig",
]
