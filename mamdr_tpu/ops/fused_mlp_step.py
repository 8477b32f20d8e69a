"""Fused MLP train-step kernel: forward + backward in ONE Pallas call.

The flagship MAMDR path (reference config mlp_* on Taobao, deepctr.py:118-136)
is a tiny 3-layer MLP over concatenated field embeddings. Under XLA the
train step compiles to ~6 separate fusions whose inter-fusion activation
traffic ([B,384..64] f32 written and re-read from HBM between fusions, plus
dropout-mask residuals for the backward pass) dominates the step: measured
~110us/step on v5e while the matmul FLOPs cost ~3us.

This kernel runs the ENTIRE differentiated tower — forward, weighted BCE,
backward through every layer, dropout with the framework's murmur3 hash
masks recomputed (not stored) in the backward — inside one Pallas call with
every activation VMEM-resident. HBM traffic per step drops to: read x
[B,384] + params (~0.6MB), write dx + dense grads (~0.6MB).

What stays in XLA around it: embedding gathers (XLA's dynamic-gather is
already bandwidth-bound), the domain-table scatter-add, the l2 table-grad
terms, and the flat-vector Adam. The kernel path is numerically equivalent
to the autodiff path (same ops, same f32 accumulation; dropout uses the
same hash family with kernel-local per-layer seeds) and is verified against
it by tests/test_fused_mlp_step.py.

Eligibility (maybe_make_fast_loss_grad): plain MLP model, no uncertainty
weighting, no batch stats, no sharded-lookup mesh, TPU backend (or
interpret=True for CPU tests). Everything else falls back to autodiff.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Pytree = Any

_MUL1 = 0x85EBCA6B
_MUL2 = 0xC2B2AE35
_IOTA_MUL = 2654435761


def _hash_keep(seed, shape, rate):
    """Murmur3-fmix32 keep-mask, identical math to ops.fast_random
    (flat row-major counter -> finalizer -> top-24-bit uniform)."""
    b, h = shape
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (rows * jnp.uint32(h) + cols) * jnp.uint32(_IOTA_MUL) + seed
    x = x ^ (x >> 16)
    x = x * jnp.uint32(_MUL1)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(_MUL2)
    x = x ^ (x >> 16)
    # Mosaic can't cast uint32->f32 directly; the top-24-bit value fits in
    # int32, so bitcast (value-preserving here) then convert.
    top24 = jax.lax.bitcast_convert_type(x >> jnp.uint32(8), jnp.int32)
    u = top24.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    return u >= jnp.float32(rate)


def _make_kernel(dims: Sequence[int], rate: float):
    """Kernel body for tower dims [in, h1, ..., hk] + 1-logit head.

    Refs: x, label(B,1), weight(B,1), seeds(L, SMEM),
          W1,b1,...,Wk,bk, Wl  ->  loss(1,1), dx, dW1,db1,...,dWk,dbk,dWl.
    """
    n_layers = len(dims) - 1

    def kernel(*refs):
        x_ref, label_ref, weight_ref, seeds_ref = refs[:4]
        w_refs = refs[4 : 4 + 2 * n_layers]
        wl_ref = refs[4 + 2 * n_layers]
        out_start = 5 + 2 * n_layers
        loss_ref = refs[out_start]
        dx_ref = refs[out_start + 1]
        dw_refs = refs[out_start + 2 : out_start + 2 + 2 * n_layers]
        dwl_ref = refs[out_start + 2 + 2 * n_layers]

        x = x_ref[:]
        label = label_ref[:]
        weight = weight_ref[:]

        # ---- forward (keep pre-activations + masks as VMEM values) ----
        acts = [x]          # layer inputs
        zs = []             # pre-activations
        keeps = []          # dropout keep masks
        h = x
        for i in range(n_layers):
            w = w_refs[2 * i][:]
            b = w_refs[2 * i + 1][:]
            z = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            zs.append(z)
            a = jnp.maximum(z, 0.0)
            if rate > 0.0:
                keep = _hash_keep(seeds_ref[i], z.shape, rate)
                keeps.append(keep)
                h = jnp.where(keep, a * jnp.float32(1.0 / (1.0 - rate)), 0.0)
            else:
                h = a
            acts.append(h)
        logits = jnp.dot(h, wl_ref[:], preferred_element_type=jnp.float32)

        # ---- weighted BCE (optax.sigmoid_binary_cross_entropy math) ----
        bce = (
            jnp.maximum(logits, 0.0)
            - logits * label
            + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
        denom = jnp.maximum(jnp.sum(weight), 1.0)
        loss_ref[0, 0] = jnp.sum(bce * weight) / denom

        # ---- backward ----
        dlogits = (jax.nn.sigmoid(logits) - label) * weight / denom  # [B,1]
        dwl_ref[:] = jnp.dot(
            acts[-1].T, dlogits, preferred_element_type=jnp.float32
        )
        dh = jnp.dot(dlogits, wl_ref[:].T, preferred_element_type=jnp.float32)
        for i in range(n_layers - 1, -1, -1):
            if rate > 0.0:
                da = jnp.where(keeps[i], dh * jnp.float32(1.0 / (1.0 - rate)), 0.0)
            else:
                da = dh
            dz = jnp.where(zs[i] > 0.0, da, 0.0)
            dw_refs[2 * i][:] = jnp.dot(
                acts[i].T, dz, preferred_element_type=jnp.float32
            )
            dw_refs[2 * i + 1][:] = jnp.sum(dz, axis=0, keepdims=True)
            dh = jnp.dot(
                dz, w_refs[2 * i][:].T, preferred_element_type=jnp.float32
            )
        dx_ref[:] = dh

    return kernel


@functools.partial(
    jax.jit, static_argnames=("dims", "rate", "interpret")
)
def _fused_tower_grad(x, label, weight, seeds, dense_params, dims, rate,
                      interpret=False):
    """x [B,in] -> (data_loss, dx [B,in], dense_grads).

    dense_params/grads: flat tuple (W1, b1, ..., Wk, bk, Wl); biases are
    [1,h] rows (TPU wants >=2D).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = x.shape[0]
    n_layers = len(dims) - 1
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    out_shape = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),            # loss
        jax.ShapeDtypeStruct((b, dims[0]), jnp.float32),      # dx
        *[
            s
            for i in range(n_layers)
            for s in (
                jax.ShapeDtypeStruct((dims[i], dims[i + 1]), jnp.float32),
                jax.ShapeDtypeStruct((1, dims[i + 1]), jnp.float32),
            )
        ],
        jax.ShapeDtypeStruct((dims[-1], 1), jnp.float32),     # dWl
    )
    in_specs = [
        vmem(), vmem(), vmem(),
        pl.BlockSpec(memory_space=pltpu.SMEM),                 # seeds
        *[vmem() for _ in range(2 * n_layers + 1)],
    ]
    flops = 2 * b * sum(dims[i] * dims[i + 1] for i in range(n_layers)) * 3
    # scalar loss lives in SMEM (Mosaic cannot store scalars to VMEM)
    out_specs = (
        pl.BlockSpec(memory_space=pltpu.SMEM),
        *[vmem() for _ in out_shape[1:]],
    )
    out = pl.pallas_call(
        _make_kernel(tuple(dims), rate),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * b * dims[0] + 2 * sum(
                dims[i] * dims[i + 1] for i in range(n_layers)
            )),
            transcendentals=2 * b,
        ),
        interpret=interpret,
    )(x, label, weight, seeds, *dense_params)
    loss = out[0][0, 0]
    dx = out[1]
    grads = out[2:]
    return loss, dx, grads


def _dense_refs(model_params):
    """MLP param tree -> ordered refs [(path_keys, leaf)] for the tower."""
    dnn = model_params["dnn"]
    names = sorted(dnn.keys(), key=lambda s: int(s.split("_")[1]))
    refs = []
    for n in names:
        refs.append(("dnn", n, "Dense_0", "kernel"))
        refs.append(("dnn", n, "Dense_0", "bias"))
    refs.append(("logit", "Dense_0", "Dense_0", "kernel"))
    return refs


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def maybe_make_fast_loss_grad(model, cfg, interpret: bool = False):
    """Returns f(params, batch, rng) -> (data_loss, grads) or None.

    Gated to the exact flagship shape: plain MLP, no uncertainty weighting,
    no batch stats, single-device lookups, TPU backend (unless interpret).
    """
    from mamdr_tpu.ops.embedding_lookup import _LOOKUP_MESH, embedding_lookup

    if type(model).__name__ != "MLP":
        return None
    if getattr(model, "compute_dtype", "float32") != "float32":
        return None  # the kernel computes f32; bf16 towers take autodiff
    if cfg.uncertainty_weight or cfg.has_batch_stats:
        return None
    if _LOOKUP_MESH["mesh"] is not None:
        return None
    # compiled Pallas needs the TPU backend; this image's tunneled chip may
    # report its platform as "axon" rather than "tpu", so exclude only CPU
    if not interpret and jax.default_backend() == "cpu":
        return None

    dims = (
        int(model.user_dim) + int(model.item_dim) + int(model.domain_dim),
        *[int(h) for h in model.hidden_dim],
    )
    rate = float(model.dropout)
    u_dim, i_dim = int(model.user_dim), int(model.item_dim)
    l2 = float(cfg.l2_emb)
    emb_trainable = bool(cfg.emb_trainable)

    def loss_grad(params, batch, rng, train: bool = True):
        from mamdr_tpu.ops.fast_random import key_to_seed

        mp = params["model"]
        emb = mp["embedding"]
        u = embedding_lookup(emb["user_emb"], batch["uid"])
        p = embedding_lookup(emb["item_emb"], batch["pid"])
        d = embedding_lookup(emb["domain_emb"], batch["domain"])
        x = jnp.concatenate([u, p, d], axis=-1)

        n_layers = len(dims) - 1
        seeds = jnp.stack(
            [
                key_to_seed(jax.random.fold_in(rng, i)).astype(jnp.uint32)
                for i in range(n_layers)
            ]
        )
        ref_paths = _dense_refs(mp)
        dense = tuple(
            leaf if leaf.ndim == 2 else leaf[None, :]
            for leaf in (_get(mp, path) for path in ref_paths)
        )
        eff_rate = rate if train else 0.0
        data_loss, dx, dgrads = _fused_tower_grad(
            x, batch["label"][:, None], batch["weight"][:, None], seeds,
            dense, dims, eff_rate, interpret,
        )

        # ---- assemble the grad tree (same structure as params) ----
        # tree_map builds fresh (mutable) nested dicts, safe to fill in place
        grads_model = jax.tree_util.tree_map(jnp.zeros_like, mp)

        def set_(path, val):
            sub = grads_model
            for k in path[:-1]:
                sub = sub[k]
            sub[path[-1]] = val

        for path, g in zip(ref_paths, dgrads):
            set_(path, g.reshape(_get(mp, path).shape))

        # embedding grads: scatter-add of dx slices + l2 terms
        # (frozen tables get zeros — flat Adam ignores them anyway, and the
        # autodiff path's l2 is stop_gradded for them: steps._l2_term)
        dd = dx[:, u_dim + i_dim :]
        dom_grad = jnp.zeros_like(emb["domain_emb"]).at[batch["domain"]].add(dd)
        dom_grad = dom_grad + 2.0 * l2 * emb["domain_emb"]
        grads_model["embedding"]["domain_emb"] = dom_grad
        if emb_trainable:
            du = dx[:, :u_dim]
            dp = dx[:, u_dim : u_dim + i_dim]
            grads_model["embedding"]["user_emb"] = (
                jnp.zeros_like(emb["user_emb"]).at[batch["uid"]].add(du)
                + 2.0 * l2 * emb["user_emb"]
            )
            grads_model["embedding"]["item_emb"] = (
                jnp.zeros_like(emb["item_emb"]).at[batch["pid"]].add(dp)
                + 2.0 * l2 * emb["item_emb"]
            )

        grads = {
            k: (grads_model if k == "model"
                else jax.tree_util.tree_map(jnp.zeros_like, v))
            for k, v in params.items()
        }
        return data_loss, grads

    return loss_grad
