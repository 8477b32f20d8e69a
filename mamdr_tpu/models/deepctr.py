"""Single-tower CTR model zoo: MLP, WDL, DeepFM, NFM, AutoInt, CCPM, PNN.

Re-implementations (from behavioral spec, not code) of the architectures the
reference obtains from the external deepctr==0.9.0 package plus its in-repo
MLP (reference model_zoo/DeepCTR/deepctr.py:16-136; behavioral spec in
SURVEY §2.2). Every model maps (uid, pid, domain) id batches to a single
click logit; the sigmoid lives in the loss/metric layer.

All interactions are static-shaped over the 3 feature fields, so each model
compiles to a short chain of MXU matmuls + fused VPU elementwise — the XLA
sweet spot. No data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.models.embeddings import (
    EmbeddingBlock,
    LinearEmbeddingBlock,
    stack_fields,
)
from mamdr_tpu.models.layers import (
    DNN,
    Dense,
    InteractingLayer,
    KMaxPooling,
    LogitDense,
    OuterProduct,
    bi_interaction,
    fm_interaction,
    inner_product,
)


class _Base(nn.Module):
    """Shared attribute block for the single-tower models."""

    n_uid: int = 1
    n_pid: int = 1
    n_domain: int = 1
    user_dim: int = 128
    item_dim: int = 128
    domain_dim: int = 128
    hidden_dim: Sequence[int] = (256, 128, 64)
    dropout: float = 0.0
    pretrained_user: Optional[np.ndarray] = None
    pretrained_item: Optional[np.ndarray] = None
    # AutoInt
    att_head_num: int = 4
    att_layer_num: int = 3
    att_embedding_size: int = 8
    # CCPM
    conv_kernel_width: Sequence[int] = (6, 5)
    conv_filters: Sequence[int] = (4, 4)
    # PNN
    use_inner: bool = True
    use_outter: bool = False
    # Mixed-precision tower compute ("float32" | "bfloat16"): params stay
    # float32; dense matmuls run at the requested dtype with f32 accumulation
    # (flax Dense dtype). Embeddings, loss, and metrics stay float32.
    compute_dtype: str = "float32"

    @property
    def cdtype(self):
        return None if self.compute_dtype == "float32" else jnp.dtype(self.compute_dtype)

    def embed(self, uid, pid, domain):
        return EmbeddingBlock(
            self.n_uid, self.n_pid, self.n_domain,
            self.user_dim, self.item_dim, self.domain_dim,
            self.pretrained_user, self.pretrained_item,
            name="embedding",
        )(uid, pid, domain)

    def linear_logit(self, uid, pid, domain):
        return LinearEmbeddingBlock(
            self.n_uid, self.n_pid, self.n_domain, name="linear"
        )(uid, pid, domain)


class MLP(_Base):
    """In-repo MLP: concat field embeddings -> DNN -> Dense(1,no bias)
    (reference deepctr.py:118-136)."""

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        x = jnp.concatenate([u, p, d], axis=-1)
        x = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(x, train)
        return LogitDense(dtype=self.cdtype, name="logit")(x)


class WDL(_Base):
    """Wide & Deep: linear logits + DNN logit."""

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        deep = jnp.concatenate([u, p, d], axis=-1)
        deep = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(deep, train)
        return self.linear_logit(uid, pid, domain) + LogitDense(dtype=self.cdtype, name="logit")(deep)


class DeepFM(_Base):
    """linear + FM second-order + DNN over concat embeddings."""

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        fields = stack_fields(u, p, d)
        deep = jnp.concatenate([u, p, d], axis=-1)
        deep = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(deep, train)
        return (
            self.linear_logit(uid, pid, domain)
            + fm_interaction(fields)
            + LogitDense(dtype=self.cdtype, name="logit")(deep)
        )


class NFM(_Base):
    """linear + DNN over bi-interaction pooled embeddings."""

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        fields = stack_fields(u, p, d)
        x = bi_interaction(fields)
        x = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(x, train)
        return self.linear_logit(uid, pid, domain) + LogitDense(dtype=self.cdtype, name="logit")(x)


class AutoInt(_Base):
    """Stacked multi-head self-attention over fields + parallel DNN.

    deepctr AutoInt with att_layer_num=3, att_embedding_size=8, att_head_num=4
    (reference call deepctr.py:37-39 passes att_head_num=4, rest defaults);
    final logit = Dense(concat(flatten(att_out), dnn_out)).
    """

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        fields = stack_fields(u, p, d)
        att = fields
        for i in range(self.att_layer_num):
            att = InteractingLayer(
                self.att_embedding_size, self.att_head_num, name=f"interacting_{i}"
            )(att)
        att = att.reshape(att.shape[0], -1)
        deep = jnp.concatenate([u, p, d], axis=-1)
        deep = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(deep, train)
        x = jnp.concatenate([att, deep], axis=-1)
        return self.linear_logit(uid, pid, domain) + LogitDense(dtype=self.cdtype, name="logit")(x)


class CCPM(_Base):
    """Convolutional click prediction: conv over the field axis + k-max pooling.

    With F=3 fields the conv widths clamp to the field count; p-max pooling
    follows CCPM's schedule k_i = max(1, ceil((1 - (i/l)^(l-i)) * n)).
    """

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        x = stack_fields(u, p, d)            # [B, F, D]
        l = len(self.conv_filters)
        n_fields = x.shape[1]
        x = x[..., None]                      # [B, F, D, 1] NHWC
        for i, (width, filters) in enumerate(
            zip(self.conv_kernel_width, self.conv_filters)
        ):
            width = min(width, x.shape[1])
            x = nn.Conv(
                filters, kernel_size=(width, 1), padding="SAME", name=f"conv_{i}"
            )(x)
            x = nn.tanh(x)
            if i < l - 1:
                k = max(1, int((1 - (float(i + 1) / l) ** (l - i - 1)) * n_fields))
            else:
                k = 3
            k = min(k, x.shape[1])
            x = KMaxPooling(k, axis=1)(x)
        x = x.reshape(x.shape[0], -1)
        x = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(x, train)
        return self.linear_logit(uid, pid, domain) + LogitDense(dtype=self.cdtype, name="logit")(x)


class PNN(_Base):
    """Product-based NN: [embeddings, inner/outer products] -> DNN -> logit.

    (reference calls models.PNN with defaults: use_inner=True, use_outter=False,
    no linear part — deepctr.py:45-46.)
    """

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        u, p, d = self.embed(uid, pid, domain)
        fields = stack_fields(u, p, d)
        parts = [jnp.concatenate([u, p, d], axis=-1)]
        if self.use_inner:
            parts.append(inner_product(fields))
        if self.use_outter:
            parts.append(OuterProduct(name="outer_product")(fields))
        x = jnp.concatenate(parts, axis=-1)
        x = DNN(tuple(self.hidden_dim), self.dropout, dtype=self.cdtype, name="dnn")(x, train)
        return LogitDense(dtype=self.cdtype, name="logit")(x)
