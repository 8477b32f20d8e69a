from mamdr_tpu.strategies.base import build_strategy

__all__ = ["build_strategy"]
