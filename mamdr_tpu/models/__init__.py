from mamdr_tpu.models.zoo import build_model

__all__ = ["build_model"]
