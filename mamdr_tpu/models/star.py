"""STAR: star-topology multi-domain model (shared ⊙ domain-specific FCN).

Re-implementation of the reference's in-repo STAR
(reference model_zoo/Star/star.py:18-127):

  embeddings concat [B, 3d] -> {PartitionedNorm | BatchNorm | none}
  -> tower: plain Dense stack or StarFCN stack (per ``dense`` config)
  -> (+ AuxiliaryNet residual iff ``auxiliary_net``) -> Dense(1) head.

Naming is load-bearing: StarFCN/PartitionedNorm parameters are named
``kernel_shared/bias_shared/kernel_specific/bias_specific`` and
``gamma_shared/.../beta_specific`` exactly as in the reference
(star_fcn.py:61-99, partitioned_norm.py:60-98) so ``meta_parms`` substring
filters like ["emb", "kernel_shared", "bias_shared"]
(config/Taobao-10/star_taobao.json) select the same sets.

TPU design deltas:
  - the per-domain branch is a table row: [n_domain, in, out] indexed by the
    batch's scalar domain id (single-domain-batch invariant, SURVEY §2.4) —
    replacing the reference's tf.case ladder with one gather;
  - PartitionedNorm moving stats live in the flax "batch_stats" collection as
    [n_domain, dim] arrays updated via .at[idx] — functional, scan-friendly.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.ops.embedding_lookup import embedding_lookup
from mamdr_tpu.models.layers import Dense, glorot_uniform

# Keras layers.Embedding default init: RandomUniform(-0.05, 0.05)
# (star.py:115-126 uses plain layers.Embedding, unlike deepctr's
# RandomNormal(1e-4)). Symmetric — nn.initializers.uniform samples [0, scale)
# which would shift the distribution all-positive at half the spread.
def keras_embedding_init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-0.05, maxval=0.05)


class StarFCN(nn.Module):
    """Dense layer with star topology (star_fcn.py:105-123).

    effective_kernel = kernel_shared * kernel_specific[domain]   (elementwise)
    effective_bias   = bias_shared   + bias_specific[domain]
    """

    n_domain: int
    units: int
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, domain_idx):
        in_dim = x.shape[-1]
        kernel_specific = self.param(
            "kernel_specific", glorot_uniform, (self.n_domain, in_dim, self.units)
        )
        bias_specific = self.param(
            "bias_specific", nn.initializers.zeros, (self.n_domain, self.units)
        )
        kernel_shared = self.param(
            "kernel_shared", glorot_uniform, (in_dim, self.units)
        )
        bias_shared = self.param("bias_shared", nn.initializers.zeros, (self.units,))

        kernel = kernel_shared * kernel_specific[domain_idx]
        bias = bias_shared + bias_specific[domain_idx]
        out = x @ kernel + bias
        if self.activation == "relu":
            out = nn.relu(out)
        return out


class AuxiliaryNet(nn.Module):
    """Purely domain-specific dense layer (auxiliary_net.py:61-101)."""

    n_domain: int
    units: int
    activation: Optional[str] = "relu"

    @nn.compact
    def __call__(self, x, domain_idx):
        in_dim = x.shape[-1]
        kernel_specific = self.param(
            "kernel_specific", glorot_uniform, (self.n_domain, in_dim, self.units)
        )
        bias_specific = self.param(
            "bias_specific", nn.initializers.zeros, (self.n_domain, self.units)
        )
        out = x @ kernel_specific[domain_idx] + bias_specific[domain_idx]
        if self.activation == "relu":
            out = nn.relu(out)
        return out


class PartitionedNorm(nn.Module):
    """Per-domain batch norm (partitioned_norm.py:13-203).

    gamma = gamma_shared * gamma_specific[domain]; beta = shared + specific.
    Training normalises with in-batch stats and EMA-updates the active
    domain's moving stats (momentum 0.99); inference uses that domain's
    moving stats. epsilon=1e-3, momentum=0.99 (reference defaults).
    """

    n_domain: int
    momentum: float = 0.99
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, domain_idx, train: bool = False):
        dim = x.shape[-1]
        gamma_specific = self.param(
            "gamma_specific", nn.initializers.ones, (self.n_domain, dim)
        )
        beta_specific = self.param(
            "beta_specific", nn.initializers.zeros, (self.n_domain, dim)
        )
        gamma_shared = self.param("gamma_shared", nn.initializers.ones, (dim,))
        beta_shared = self.param("beta_shared", nn.initializers.zeros, (dim,))

        moving_mean = self.variable(
            "batch_stats", "moving_mean",
            lambda: jnp.zeros((self.n_domain, dim), jnp.float32),
        )
        moving_var = self.variable(
            "batch_stats", "moving_var",
            lambda: jnp.ones((self.n_domain, dim), jnp.float32),
        )

        gamma = gamma_shared * gamma_specific[domain_idx]
        beta = beta_shared + beta_specific[domain_idx]

        if train:
            mean = jnp.mean(x, axis=0)
            var = jnp.var(x, axis=0)
            if not self.is_initializing():
                m = self.momentum
                moving_mean.value = moving_mean.value.at[domain_idx].set(
                    moving_mean.value[domain_idx] * m + mean * (1.0 - m)
                )
                moving_var.value = moving_var.value.at[domain_idx].set(
                    moving_var.value[domain_idx] * m + var * (1.0 - m)
                )
        else:
            mean = moving_mean.value[domain_idx]
            var = moving_var.value[domain_idx]

        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * gamma + beta


class Star(nn.Module):
    """Full STAR model (star.py:70-96)."""

    n_uid: int = 1
    n_pid: int = 1
    n_domain: int = 1
    user_dim: int = 128
    item_dim: int = 128
    domain_dim: int = 128
    auxiliary_dim: int = 128
    hidden_dim: Sequence[int] = (256, 128, 64)
    norm: str = "none"            # pn | bn | none
    dense: str = "dense"          # dense | star
    auxiliary_net: bool = False
    dropout: float = 0.0          # unused by reference Star; kept for config parity
    pretrained_user: Optional[np.ndarray] = None
    pretrained_item: Optional[np.ndarray] = None
    # accepted for zoo-config parity; STAR computes float32 (the star/PN
    # weight-merge numerics are part of the reference contract)
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        def table_init(pre):
            if pre is not None:
                arr = jnp.asarray(pre, jnp.float32)
                return lambda key, s: arr
            return lambda key, s: keras_embedding_init(key, s)

        user_emb = self.param(
            "user_emb", table_init(self.pretrained_user), (self.n_uid, self.user_dim)
        )
        item_emb = self.param(
            "item_emb", table_init(self.pretrained_item), (self.n_pid, self.item_dim)
        )
        domain_emb = self.param(
            "domain_emb", keras_embedding_init, (self.n_domain, self.domain_dim)
        )
        u = embedding_lookup(user_emb, uid)
        p = embedding_lookup(item_emb, pid)
        d = embedding_lookup(domain_emb, domain)
        x = jnp.concatenate([u, p, d], axis=-1)  # [B, 3d]

        domain_idx = domain[0]  # single-domain-batch invariant

        if self.norm == "pn":
            x = PartitionedNorm(self.n_domain, name="partitioned_norm")(
                x, domain_idx, train
            )
        elif self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3, name="bn"
            )(x)

        # AuxiliaryNet is ALWAYS constructed (its params exist and train),
        # but its output is only added when the flag is set (star.py:80-93).
        aux_out = AuxiliaryNet(
            self.n_domain, self.auxiliary_dim, name="auxiliary_net"
        )(x, domain_idx)

        if self.dense == "star":
            for i, h in enumerate(self.hidden_dim):
                x = StarFCN(self.n_domain, h, name=f"star_fcn_{i}")(x, domain_idx)
        else:
            for i, h in enumerate(self.hidden_dim):
                x = nn.relu(Dense(h, name=f"dense_{i}")(x))

        if self.auxiliary_net:
            x = x + aux_out

        # Final Dense(1, sigmoid) in the reference; we emit the pre-sigmoid
        # logit (bias included, Keras default) — sigmoid lives in the loss.
        return Dense(1, name="head")(x)[..., 0]
