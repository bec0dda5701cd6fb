from reftr_tpu.models.build import build_model

__all__ = ["build_model"]
