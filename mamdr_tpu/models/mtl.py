"""Multi-task CTR models: SharedBottom, MMoE, PLE — one task per domain.

The reference treats each domain as a task with its own binary tower head
named ``domain_i`` and trains/evaluates one head at a time via per-domain
sub-models (reference model_zoo/DeepMTLCTR/deep_mtl_ctr.py:17-233; behavioral
spec of the deepctr architectures in SURVEY §2.2).

TPU-first design delta: instead of materialising N Keras sub-models, every
forward computes ALL task towers batched as one ``[T, ...]`` einsum (tiny T,
so this is one fat MXU matmul instead of T thin ones) and selects the active
domain's logit with a gather on the scalar domain id — preserving the
single-domain-batch invariant (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mamdr_tpu.models.embeddings import EmbeddingBlock
from mamdr_tpu.models.layers import DNN, Dense, FastDropout, glorot_uniform, glorot_normal


class TaskTowers(nn.Module):
    """All per-task towers in one batched einsum: [B,Din] -> [B,T] logits."""

    n_task: int
    hidden: Sequence[int]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: [B, Din] (shared input) or [T, B, Din] (per-task inputs, e.g. MMoE)
        per_task_input = x.ndim == 3
        if not per_task_input:
            x = jnp.broadcast_to(x[None], (self.n_task,) + x.shape)
        for li, units in enumerate(self.hidden):
            w = self.param(f"tower_kernel_{li}", glorot_uniform, (self.n_task, x.shape[-1], units))
            b = self.param(f"tower_bias_{li}", nn.initializers.zeros, (self.n_task, units))
            x = jnp.einsum("tbi,tio->tbo", x, w) + b[:, None, :]
            x = nn.relu(x)
            if self.dropout > 0.0:
                x = FastDropout(self.dropout)(x, deterministic=not train)
        w = self.param("tower_logit", glorot_normal, (self.n_task, x.shape[-1], 1))
        logits = jnp.einsum("tbi,tio->tbo", x, w)[..., 0]  # [T, B]
        return logits


class _MTLBase(nn.Module):
    n_uid: int = 1
    n_pid: int = 1
    n_domain: int = 1
    user_dim: int = 128
    item_dim: int = 128
    domain_dim: int = 128
    hidden_dim: Sequence[int] = (512, 256, 128)
    tower_hidden_dim: Sequence[int] = (64,)
    dropout: float = 0.0
    num_experts: int = 4
    gate_dnn_hidden_units: Sequence[int] = ()
    specific_expert_num: int = 1
    shared_expert_num: int = 1
    num_levels: int = 2
    pretrained_user: Optional[np.ndarray] = None
    pretrained_item: Optional[np.ndarray] = None
    # accepted for zoo-config parity; MTL towers currently compute float32
    compute_dtype: str = "float32"

    def embed_concat(self, uid, pid, domain):
        u, p, d = EmbeddingBlock(
            self.n_uid, self.n_pid, self.n_domain,
            self.user_dim, self.item_dim, self.domain_dim,
            self.pretrained_user, self.pretrained_item,
            name="embedding",
        )(uid, pid, domain)
        return jnp.concatenate([u, p, d], axis=-1)

    @staticmethod
    def select_head(all_logits: jax.Array, domain: jax.Array) -> jax.Array:
        """[T,B] + batch domain ids -> [B], using the single-domain invariant."""
        return all_logits[domain[0]]


class SharedBottom(_MTLBase):
    """Shared bottom DNN -> per-task towers (deep_mtl_ctr.py:26-30)."""

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        x = self.embed_concat(uid, pid, domain)
        x = DNN(tuple(self.hidden_dim), self.dropout, name="bottom_dnn")(x, train)
        logits = TaskTowers(
            self.n_domain, tuple(self.tower_hidden_dim), self.dropout, name="towers"
        )(x, train)
        return self.select_head(logits, domain)


class ExpertBank(nn.Module):
    """E parallel expert DNNs batched on the expert axis: [B,Din] -> [E,B,Dout]."""

    n_expert: int
    hidden: Sequence[int]
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.broadcast_to(x[None], (self.n_expert,) + x.shape)
        for li, units in enumerate(self.hidden):
            w = self.param(f"expert_kernel_{li}", glorot_uniform, (self.n_expert, x.shape[-1], units))
            b = self.param(f"expert_bias_{li}", nn.initializers.zeros, (self.n_expert, units))
            x = jnp.einsum("ebi,eio->ebo", x, w) + b[:, None, :]
            x = nn.relu(x)
            if self.dropout > 0.0:
                x = FastDropout(self.dropout)(x, deterministic=not train)
        return x  # [E, B, D]


class MMoE(_MTLBase):
    """Multi-gate mixture of experts: per-task softmax gates over a shared
    expert bank, then per-task towers (deep_mtl_ctr.py:31-38)."""

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        x = self.embed_concat(uid, pid, domain)
        experts = ExpertBank(
            self.num_experts, tuple(self.hidden_dim), self.dropout, name="experts"
        )(x, train)  # [E, B, D]
        # Per-task gates: softmax over experts, input = raw features.
        gate_in = x
        if self.gate_dnn_hidden_units:
            gate_in = DNN(tuple(self.gate_dnn_hidden_units), self.dropout, name="gate_dnn")(gate_in, train)
        wg = self.param("gate_kernel", glorot_uniform, (self.n_domain, gate_in.shape[-1], self.num_experts))
        gates = jax.nn.softmax(jnp.einsum("bi,tie->tbe", gate_in, wg), axis=-1)  # [T,B,E]
        mixed = jnp.einsum("tbe,ebd->tbd", gates, experts)  # [T,B,D]
        logits = TaskTowers(
            self.n_domain, tuple(self.tower_hidden_dim), self.dropout, name="towers"
        )(mixed, train)
        return self.select_head(logits, domain)


class PLE(_MTLBase):
    """Progressive Layered Extraction (CGC stacked num_levels times).

    Per level: each task has `specific_expert_num` own experts plus
    `shared_expert_num` shared experts; task gates mix {task experts, shared
    experts}; the shared path's gate mixes ALL experts. Final level feeds
    per-task towers (deep_mtl_ctr.py:39-48 behavioral spec).
    """

    @nn.compact
    def __call__(self, uid, pid, domain, train: bool = False):
        x = self.embed_concat(uid, pid, domain)
        t, s = self.specific_expert_num, self.shared_expert_num
        task_inputs = jnp.broadcast_to(x[None], (self.n_domain,) + x.shape)  # [T,B,D]
        shared_input = x
        for level in range(self.num_levels):
            hidden = (self.hidden_dim[min(level, len(self.hidden_dim) - 1)],)
            # Task-specific experts: [T*t, B, D'] built per-task from task_inputs.
            tw = self.param(
                f"task_expert_kernel_{level}", glorot_uniform,
                (self.n_domain, t, task_inputs.shape[-1], hidden[0]),
            )
            tb = self.param(
                f"task_expert_bias_{level}", nn.initializers.zeros,
                (self.n_domain, t, hidden[0]),
            )
            task_experts = nn.relu(
                jnp.einsum("kbi,ktio->ktbo", task_inputs, tw) + tb[:, :, None, :]
            )  # [T, t, B, D']
            sw = self.param(
                f"shared_expert_kernel_{level}", glorot_uniform,
                (s, shared_input.shape[-1], hidden[0]),
            )
            sb = self.param(
                f"shared_expert_bias_{level}", nn.initializers.zeros, (s, hidden[0])
            )
            shared_experts = nn.relu(
                jnp.einsum("bi,sio->sbo", shared_input, sw) + sb[:, None, :]
            )  # [s, B, D']

            # Task gates over [own t experts + s shared experts].
            gk = self.param(
                f"task_gate_kernel_{level}", glorot_uniform,
                (self.n_domain, task_inputs.shape[-1], t + s),
            )
            gates = jax.nn.softmax(
                jnp.einsum("kbi,kie->kbe", task_inputs, gk), axis=-1
            )  # [T, B, t+s]
            shared_b = jnp.broadcast_to(
                shared_experts[None], (self.n_domain,) + shared_experts.shape
            )  # [T, s, B, D']
            cat = jnp.concatenate([task_experts, shared_b], axis=1)  # [T, t+s, B, D']
            task_inputs = jnp.einsum("kbe,kebd->kbd", gates, cat)

            # Shared gate over ALL experts (T*t + s).
            all_experts = jnp.concatenate(
                [task_experts.reshape(-1, *task_experts.shape[2:]), shared_experts],
                axis=0,
            )  # [T*t+s, B, D']
            sgk = self.param(
                f"shared_gate_kernel_{level}", glorot_uniform,
                (shared_input.shape[-1], self.n_domain * t + s),
            )
            sgates = jax.nn.softmax(shared_input @ sgk, axis=-1)  # [B, T*t+s]
            shared_input = jnp.einsum("be,ebd->bd", sgates, all_experts)

        logits = TaskTowers(
            self.n_domain, tuple(self.tower_hidden_dim), self.dropout, name="towers"
        )(task_inputs, train)
        return self.select_head(logits, domain)
