"""Sparse-feature embedding block: uid / pid / domain tables.

Reproduces the reference feature setup — three SparseFeats with optional
pretrained constant-initialised user/item tables and a trainable flag
(reference model_zoo/DeepCTR/deepctr.py:95-116, utils/dataset.py:57-61).
Freezing is NOT done here (params are pure pytrees); the trainer applies an
optax mask that zeroes updates for paths containing "emb" when
``emb_trainable`` is false — reproducing Keras `trainable=False` without
forking the model code.

Param paths all contain "emb" so the reference's ``meta_parms`` name filters
("all_hidden" excludes "emb"; explicit "emb" selects them —
reference maml.py:153-179) work unchanged on the flax param tree.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.models.layers import emb_init
from mamdr_tpu.ops.embedding_lookup import embedding_lookup


def _table_init(pretrained: Optional[np.ndarray], shape):
    if pretrained is not None:
        arr = jnp.asarray(pretrained, jnp.float32)
        assert arr.shape == shape, f"pretrained shape {arr.shape} != {shape}"
        return lambda key, s: arr
    return lambda key, s: emb_init(key, s)


class EmbeddingBlock(nn.Module):
    """Field embeddings -> [B, 3, D] stack (requires equal dims) or tuple."""

    n_uid: int
    n_pid: int
    n_domain: int
    user_dim: int
    item_dim: int
    domain_dim: int
    pretrained_user: Optional[np.ndarray] = None
    pretrained_item: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, uid, pid, domain):
        user_emb = self.param(
            "user_emb", _table_init(self.pretrained_user, (self.n_uid, self.user_dim)),
            (self.n_uid, self.user_dim),
        )
        item_emb = self.param(
            "item_emb", _table_init(self.pretrained_item, (self.n_pid, self.item_dim)),
            (self.n_pid, self.item_dim),
        )
        domain_emb = self.param(
            "domain_emb", emb_init, (self.n_domain, self.domain_dim)
        )
        u = embedding_lookup(user_emb, uid)
        p = embedding_lookup(item_emb, pid)
        d = embedding_lookup(domain_emb, domain)
        return u, p, d


class LinearEmbeddingBlock(nn.Module):
    """Dim-1 embeddings for the linear ("wide") term of WDL/DeepFM/NFM/...

    deepctr's linear part looks up separate 1-dim tables per sparse feature
    and sums them (behavioral spec SURVEY §2.2). Init zeros like Keras
    Embedding in deepctr's linear layer (RandomNormal 1e-4 also used there;
    we use the same tiny normal for symmetry).
    """

    n_uid: int
    n_pid: int
    n_domain: int

    @nn.compact
    def __call__(self, uid, pid, domain):
        lu = self.param("linear_user_emb", emb_init, (self.n_uid, 1))
        lp = self.param("linear_item_emb", emb_init, (self.n_pid, 1))
        ld = self.param("linear_domain_emb", emb_init, (self.n_domain, 1))
        out = (
            embedding_lookup(lu, uid)
            + embedding_lookup(lp, pid)
            + embedding_lookup(ld, domain)
        )
        return out[..., 0]  # [B]


def stack_fields(u: jax.Array, p: jax.Array, d: jax.Array) -> jax.Array:
    """[B,D]x3 -> [B,3,D]; requires equal dims (true of every shipped config)."""
    assert u.shape[-1] == p.shape[-1] == d.shape[-1], (
        "field-interaction models require user_dim == item_dim == domain_dim"
    )
    return jnp.stack([u, p, d], axis=1)
