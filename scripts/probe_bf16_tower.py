"""Would a bf16 compute tower speed up the (vmapped) train step?

The 30-lane DR step spends ~640 of ~1320 us outside the gathers (tower
fwd/bwd matmuls + Adam + formation). The MXU runs bf16 at 2x f32 rate, so
a mixed-precision tower (f32 master weights + bf16 matmuls, f32
accumulation) bounds the possible win. This probe hand-rolls the MLP
tower (same shapes as the flagship: [384,256,128,64,1], batch 1024,
f32 gathers from 100k x 128 tables) with autodiff + a flat-Adam-like
update, and measures 30-lane vmapped steps in f32 vs bf16-compute.

Decision rule: >10-15% end-to-end -> implement a compute_dtype knob in
the model zoo; less -> record as a dead end (PERF.md).

Run only when the TPU is free: timeout 2400 python scripts/probe_bf16_tower.py
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

S_OUTER, L, B = 136, 30, 1024
N_ROWS, EMB = 100_000, 128
DIMS = (384, 256, 128, 64, 1)


def make_step(compute_dtype):
    def apply_tower(dense, x):
        x = x.astype(compute_dtype)
        for i, (w, b) in enumerate(dense):
            x = jnp.dot(
                x, w.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            ).astype(compute_dtype) + b.astype(compute_dtype)
            if i < len(dense) - 1:
                x = jax.nn.relu(x)
        return x[..., 0].astype(jnp.float32)

    def loss_fn(dense, tables, batch):
        u = jnp.take(tables[0], batch["uid"], axis=0, mode="clip")
        p = jnp.take(tables[1], batch["pid"], axis=0, mode="clip")
        d = jnp.take(tables[2], batch["domain"], axis=0, mode="clip")
        x = jnp.concatenate([u, p, d], axis=-1)
        logit = apply_tower(dense, x)
        y = batch["label"]
        ls = jnp.maximum(logit, 0) - logit * y + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        return jnp.mean(ls)

    def step(carry, batch, tables):
        dense, m, v, t = carry
        loss, grads = jax.value_and_grad(loss_fn)(dense, tables, batch)
        t = t + 1
        new_dense, new_m, new_v = [], [], []
        for (w, b), (mw, mb), (vw, vb), (gw, gb) in zip(dense, m, v, grads):
            def adam(p_, m_, v_, g_):
                m2 = 0.9 * m_ + 0.1 * g_
                v2 = 0.999 * v_ + 0.001 * g_ * g_
                mh = m2 / (1 - 0.9 ** t)
                vh = v2 / (1 - 0.999 ** t)
                return p_ - 1e-3 * mh / (jnp.sqrt(vh) + 1e-8), m2, v2
            w2, mw2, vw2 = adam(w, mw, vw, gw)
            b2, mb2, vb2 = adam(b, mb, vb, gb)
            new_dense.append((w2, b2))
            new_m.append((mw2, mb2))
            new_v.append((vw2, vb2))
        return (tuple(new_dense), tuple(new_m), tuple(new_v), t), loss

    return step


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    tables = tuple(
        jnp.asarray(rng.normal(0, 0.05, (N_ROWS, EMB)), jnp.float32)
        for _ in range(3)
    )
    dense = tuple(
        (jnp.asarray(rng.normal(0, 0.05, (DIMS[i], DIMS[i + 1])), jnp.float32),
         jnp.zeros((DIMS[i + 1],), jnp.float32))
        for i in range(len(DIMS) - 1)
    )
    zeros = jax.tree_util.tree_map(jnp.zeros_like, dense)
    stack = lambda t: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (L,) + x.shape), t
    )
    carry0 = (stack(dense), stack(zeros), stack(zeros),
              jnp.zeros((L,), jnp.int32))

    data = {
        "uid": jnp.asarray(rng.integers(0, N_ROWS, (S_OUTER, L, B)), jnp.int32),
        "pid": jnp.asarray(rng.integers(0, N_ROWS, (S_OUTER, L, B)), jnp.int32),
        "domain": jnp.zeros((S_OUTER, L, B), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 2, (S_OUTER, L, B)), jnp.float32),
    }

    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        step = make_step(dt)

        @jax.jit
        def run(carry, data):
            vstep = jax.vmap(partial(step, tables=tables))

            def body(c, b):
                return vstep(c, b)
            carry, losses = jax.lax.scan(body, carry, data)
            return jnp.mean(losses), carry

        out = run(carry0, data)
        float(out[0])
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = run(carry0, data)
            float(out[0])
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        n_ex = S_OUTER * L * B
        print(f"{name:5s}: {med*1000:7.1f}ms, {med/n_ex*1e9:6.2f} ns/example, "
              f"{n_ex/med/1e6:7.2f}M ex/s", flush=True)


if __name__ == "__main__":
    main()
