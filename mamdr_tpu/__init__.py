"""mamdr_tpu — a TPU-native multi-domain recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
RManLuo/MAMDR (ICDE'23, arXiv:2202.12524): CTR base models over N domains
with a meta-learning strategy control plane (MAML, Reptile, MLDG, Domain
Negotiation, Domain Regularization, PCGrad, uncertainty weighting), per-domain
streaming-AUC evaluation, and row-sharded embedding tables over a TPU mesh.

Everything under `jit` is functional: model parameters are pytrees, the
strategy control plane is weight-space algebra over pytrees (on device — no
host round-trips), and per-domain epochs are `lax.scan`-fused.
"""

__version__ = "0.1.0"

from mamdr_tpu.config import ExperimentConfig, load_config, parse_model_name

__all__ = [
    "ExperimentConfig",
    "load_config",
    "parse_model_name",
]
