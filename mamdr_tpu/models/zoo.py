"""Model factory: config -> flax module (substring dispatch like run.py:37-47)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.models import deepctr as deepctr_models
from mamdr_tpu.models.mtl import MMoE, PLE, SharedBottom
from mamdr_tpu.models.star import Star

_DEEPCTR = {
    "mlp": deepctr_models.MLP,
    "wdl": deepctr_models.WDL,
    "nfm": deepctr_models.NFM,
    "autoint": deepctr_models.AutoInt,
    "ccpm": deepctr_models.CCPM,
    "pnn": deepctr_models.PNN,
    "deepfm": deepctr_models.DeepFM,
}
_MTL = {"shared_bottom": SharedBottom, "mmoe": MMoE, "ple": PLE}


def build_model(
    config: ExperimentConfig,
    n_uid: int,
    n_pid: int,
    n_domain: int,
    pretrained_user: Optional[np.ndarray] = None,
    pretrained_item: Optional[np.ndarray] = None,
):
    """Instantiate the base model for a config.

    Pretrained tables are passed only when ``train.load_pretrain_emb`` is set
    (reference deepctr.py:104-116); freezing is the trainer's job (optax mask
    on "emb" paths when ``train.emb_trainable`` is false).
    """
    mc = config.model
    spec = mc.spec
    if not config.train.load_pretrain_emb:
        pretrained_user = pretrained_item = None

    common = dict(
        n_uid=n_uid,
        n_pid=n_pid,
        n_domain=n_domain,
        user_dim=mc.user_dim,
        item_dim=mc.item_dim,
        domain_dim=mc.domain_dim,
        hidden_dim=tuple(mc.hidden_dim),
        dropout=mc.dropout,
        pretrained_user=pretrained_user,
        pretrained_item=pretrained_item,
        compute_dtype=mc.compute_dtype,
    )

    if spec.base_family == "star":
        return Star(
            auxiliary_dim=mc.auxiliary_dim,
            norm=mc.norm,
            dense=mc.dense,
            auxiliary_net=mc.auxiliary_net,
            **common,
        )
    if spec.base_family == "deepctr":
        cls = _DEEPCTR[spec.base]
        extra = {}
        if spec.base == "autoint":
            extra = dict(att_head_num=mc.att_head_num, att_layer_num=mc.att_layer_num)
        elif spec.base == "ccpm":
            extra = dict(
                conv_kernel_width=tuple(mc.conv_kernel_width),
                conv_filters=tuple(mc.conv_filters),
            )
        elif spec.base == "pnn":
            extra = dict(use_inner=mc.use_inner, use_outter=mc.use_outter)
        return cls(**common, **extra)
    if spec.base_family == "mtl":
        cls = _MTL[spec.base]
        return cls(
            tower_hidden_dim=tuple(mc.tower_hidden_dim),
            num_experts=mc.num_experts,
            gate_dnn_hidden_units=tuple(mc.gate_dnn_hidden_units),
            specific_expert_num=mc.specific_expert_num,
            shared_expert_num=mc.shared_expert_num,
            num_levels=mc.num_levels,
            **common,
        )
    raise ValueError(f"unknown base family {spec.base_family}")
