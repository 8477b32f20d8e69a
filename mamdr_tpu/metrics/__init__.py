from mamdr_tpu.metrics.auc import (
    AucState,
    auc_init,
    auc_result,
    auc_thresholds,
    auc_update,
)

__all__ = ["AucState", "auc_init", "auc_update", "auc_result", "auc_thresholds"]
