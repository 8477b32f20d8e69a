"""Shared layers for the CTR model zoo.

Keras-compatible building blocks re-expressed in flax. Initialisation matches
what the reference models actually use (Keras defaults / deepctr 0.9.0):
Dense kernels glorot_uniform + zero bias, DNN = [Dense -> relu -> dropout]*,
final logit Dense(1, no bias, glorot_normal)
(reference model_zoo/DeepCTR/deepctr.py:118-136).

Everything is batch-major and static-shaped; no data-dependent control flow,
so XLA fuses each tower into a handful of MXU matmuls.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

glorot_uniform = nn.initializers.glorot_uniform()
glorot_normal = nn.initializers.glorot_normal()
zeros_init = nn.initializers.zeros
# deepctr SparseFeat default embeddings_initializer=RandomNormal(stddev=1e-4)
emb_init = nn.initializers.normal(stddev=1e-4)


class Dense(nn.Module):
    """Keras-default Dense: glorot_uniform kernel, zero bias.

    `dtype` is the flax COMPUTE dtype (params stay float32 — mixed
    precision): bfloat16 runs the matmul at the MXU's 2x bf16 rate."""

    features: int
    use_bias: bool = True
    kernel_init: Callable = glorot_uniform
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=zeros_init,
            dtype=self.dtype,
        )(x)


class FastDropout(nn.Module):
    """Inverted dropout with a counter-based hash mask (ops.fast_random).

    Same distribution and scaling as Keras/flax Dropout; only the random-bit
    source differs (threefry mask generation dominates CTR-model step time
    on TPU). The per-call seed still comes from the 'dropout' PRNG stream,
    so training stays reproducible under a fixed PRNGKey.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return x
        from mamdr_tpu.ops.fast_random import dropout_mask, key_to_seed

        seed = key_to_seed(self.make_rng("dropout"))
        keep = dropout_mask(seed, self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), 0.0)


class DNN(nn.Module):
    """deepctr layers.core.DNN: stacked Dense->activation->dropout.

    (reference behavioral spec: SURVEY §2.2; deepctr.py:128-133 call site with
    activation relu, no batch norm.)
    """

    hidden_units: Sequence[int]
    dropout_rate: float = 0.0
    activation: Callable = nn.relu
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for units in self.hidden_units:
            x = Dense(units, dtype=self.dtype)(x)
            x = self.activation(x)
            if self.dropout_rate > 0.0:
                x = FastDropout(self.dropout_rate)(x, deterministic=not train)
        return x


class LogitDense(nn.Module):
    """Final 1-unit logit head: Dense(1, use_bias=False, glorot_normal).
    Output is always float32 (loss/metric math stays full precision)."""

    dtype: object = None

    @nn.compact
    def __call__(self, x):
        out = Dense(1, use_bias=False, kernel_init=glorot_normal,
                    dtype=self.dtype)(x)[..., 0]
        return out.astype(jnp.float32)


def fm_interaction(field_emb: jax.Array) -> jax.Array:
    """FM second-order term: 0.5 * sum((Σ_f v)^2 − Σ_f v^2) -> [B].

    field_emb: [B, F, D]. This is the classic square-of-sum minus
    sum-of-squares identity; O(B·F·D) on the VPU, no pairwise blowup.
    """
    sum_v = jnp.sum(field_emb, axis=1)             # [B, D]
    sum_v2 = jnp.sum(field_emb * field_emb, axis=1)  # [B, D]
    return 0.5 * jnp.sum(sum_v * sum_v - sum_v2, axis=-1)


def bi_interaction(field_emb: jax.Array) -> jax.Array:
    """NFM bi-interaction pooling: 0.5*((Σv)^2 − Σv^2) -> [B, D]."""
    sum_v = jnp.sum(field_emb, axis=1)
    sum_v2 = jnp.sum(field_emb * field_emb, axis=1)
    return 0.5 * (sum_v * sum_v - sum_v2)


def inner_product(field_emb: jax.Array) -> jax.Array:
    """PNN inner-product layer: pairwise dots of field embeddings -> [B, F*(F-1)/2]."""
    b, f, d = field_emb.shape
    rows, cols = jnp.triu_indices(f, k=1)
    p = field_emb[:, rows, :]  # [B, P, D]
    q = field_emb[:, cols, :]
    return jnp.sum(p * q, axis=-1)


class OuterProduct(nn.Module):
    """PNN outer-product layer (kernel type 'mat', deepctr default).

    For each field pair (i,j): p^T W_ij q with learned kernel W [P, D, D].
    """

    @nn.compact
    def __call__(self, field_emb):
        b, f, d = field_emb.shape
        rows, cols = jnp.triu_indices(f, k=1)
        n_pairs = len(rows)
        kernel = self.param("kernel", glorot_uniform, (n_pairs, d, d))
        p = field_emb[:, rows, :]  # [B, P, D]
        q = field_emb[:, cols, :]
        # [B,P,D] x [P,D,D] -> [B,P,D] then dot with q -> [B,P]
        pw = jnp.einsum("bpd,pde->bpe", p, kernel)
        return jnp.sum(pw * q, axis=-1)


class InteractingLayer(nn.Module):
    """AutoInt multi-head self-attention over feature fields.

    deepctr InteractingLayer semantics: per-head Q/K/V projections to
    att_embedding_size, softmax(QK^T) over the field axis, concat heads, plus
    a residual projection (att_res=True default). Fields F is tiny (3), so
    this is a batched [B,F,F] attention — pure MXU work.
    """

    att_embedding_size: int = 8
    head_num: int = 4
    use_res: bool = True

    @nn.compact
    def __call__(self, x):
        # x: [B, F, D_in]
        b, f, d_in = x.shape
        unit = self.att_embedding_size * self.head_num
        wq = self.param("query", glorot_uniform, (d_in, unit))
        wk = self.param("key", glorot_uniform, (d_in, unit))
        wv = self.param("value", glorot_uniform, (d_in, unit))

        def split_heads(t):  # [B,F,unit] -> [H,B,F,S]
            t = t.reshape(b, f, self.head_num, self.att_embedding_size)
            return jnp.transpose(t, (2, 0, 1, 3))

        q = split_heads(x @ wq)
        k = split_heads(x @ wk)
        v = split_heads(x @ wv)
        scores = jnp.einsum("hbfs,hbgs->hbfg", q, k)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hbfg,hbgs->hbfs", attn, v)      # [H,B,F,S]
        out = jnp.transpose(out, (1, 2, 0, 3)).reshape(b, f, unit)
        if self.use_res:
            wr = self.param("res", glorot_uniform, (d_in, unit))
            out = out + x @ wr
        return nn.relu(out)


class KMaxPooling(nn.Module):
    """Top-k values along an axis, keeping order of magnitude (CCPM pooling)."""

    k: int
    axis: int = 1

    @nn.compact
    def __call__(self, x):
        top = jax.lax.top_k(jnp.moveaxis(x, self.axis, -1), self.k)[0]
        return jnp.moveaxis(top, -1, self.axis)
