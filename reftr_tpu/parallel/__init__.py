from reftr_tpu.parallel.sharding import (
    batch_sharding,
    create_mesh,
    param_shardings,
    param_spec,
)

__all__ = ["batch_sharding", "create_mesh", "param_shardings", "param_spec"]
