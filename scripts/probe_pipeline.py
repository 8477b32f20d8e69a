"""Probe: can the next step's embedding gathers overlap the current tower?

The flagship step is gather-bound (~120ns/row serialized dynamic-gather,
PERF.md). If XLA schedules the (DMA-engine) gather of step i+1 concurrently
with the (MXU/VPU) tower of step i, a software-pipelined scan recovers
min(gather, tower+opt) per step. This probe measures three scan bodies on
the real chip:

  A. serial:     gather(i) -> tower(i)                (the current shape)
  B. pipelined:  carry x(i); body computes tower(i) and gather(i+1)
  C. gather-only / tower-only floors for reference

Run only when the TPU is free (single-client):
    timeout 590 python scripts/probe_pipeline.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

# STEPS must put device time well above the ~33ms tunnel RTT floor
# (scripts/probe_gather.py lesson): 4096 steps x ~50us = ~200ms per dispatch.
B, STEPS, NT, D = 1024, 4096, 100_000, 128
HID = [(384, 256), (256, 128), (128, 64), (64, 1)]


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    tu = jnp.asarray(rng.normal(0, 0.1, (NT, D)), jnp.float32)
    tp = jnp.asarray(rng.normal(0, 0.1, (NT, D)), jnp.float32)
    td = jnp.asarray(rng.normal(0, 0.1, (30, D)), jnp.float32)
    ws = [jnp.asarray(rng.normal(0, 0.05, s), jnp.float32) for s in HID]
    ids_u = jnp.asarray(rng.integers(0, NT, (STEPS, B)), jnp.int32)
    ids_p = jnp.asarray(rng.integers(0, NT, (STEPS, B)), jnp.int32)
    ids_d = jnp.asarray(rng.integers(0, 30, (STEPS, B)), jnp.int32)
    y = jnp.asarray(rng.integers(0, 2, (STEPS, B)), jnp.float32)

    def gather(iu, ip, idm):
        return jnp.concatenate(
            [jnp.take(tu, iu, axis=0, mode="clip"),
             jnp.take(tp, ip, axis=0, mode="clip"),
             jnp.take(td, idm, axis=0, mode="clip")], axis=-1,
        )

    def tower_loss(w, x, yy):
        h = x
        for wi in w[:-1]:
            h = jax.nn.relu(h @ wi)
        logit = (h @ w[-1])[:, 0]
        return jnp.mean(
            jnp.maximum(logit, 0) - logit * yy + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )

    grad = jax.grad(tower_loss)

    @jax.jit
    def serial(ws):
        def body(c, xs):
            iu, ip, idm, yy = xs
            x = gather(iu, ip, idm)
            g = grad(ws, x, yy)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, c, g), None

        c, _ = jax.lax.scan(body, ws, (ids_u, ids_p, ids_d, y))
        return c[0]

    @jax.jit
    def pipelined(ws):
        x0 = gather(ids_u[0], ids_p[0], ids_d[0])

        def body(carry, xs):
            w, x_cur, y_cur = carry
            iu, ip, idm, y_next = xs
            x_next = gather(iu, ip, idm)          # independent of tower(w, x_cur)
            g = grad(w, x_cur, y_cur)
            w = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, w, g)
            return (w, x_next, y_next), None

        (w, x_last, y_last), _ = jax.lax.scan(
            body, (ws, x0, y[0]),
            (ids_u[1:], ids_p[1:], ids_d[1:], y[1:]),
        )
        g = grad(w, x_last, y_last)
        w = jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, w, g)
        return w[0]

    @jax.jit
    def gathers_only(ws):
        def body(c, xs):
            iu, ip, idm, _ = xs
            return c + jnp.sum(gather(iu, ip, idm)), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), (ids_u, ids_p, ids_d, y))
        return c

    @jax.jit
    def tower_only(ws, xfix):
        def body(c, yy):
            g = grad(c, xfix, yy)
            return jax.tree_util.tree_map(lambda a, b: a - 1e-3 * b, c, g), None

        c, _ = jax.lax.scan(body, ws, y)
        return c[0]

    xfix = gather(ids_u[0], ids_p[0], ids_d[0])

    def timeit(name, fn, *args):
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        ts = []
        for _ in range(5):
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.time() - t0)
        med = sorted(ts)[2]
        print(f"{name}: {med*1000:.1f}ms -> {med/STEPS*1e6:.1f}us/step "
              f"({STEPS*B/med/1e6:.2f}M ex/s)")
        return med

    t_g = timeit("gathers only ", gathers_only, ws)
    t_t = timeit("tower only   ", tower_only, ws, xfix)
    t_s = timeit("serial       ", serial, ws)
    t_p = timeit("pipelined    ", pipelined, ws)
    print(f"overlap efficiency: serial={t_s*1000:.1f}ms, "
          f"pipelined={t_p*1000:.1f}ms, floor=max(g,t)={max(t_g,t_t)*1000:.1f}ms, "
          f"speedup {t_s/t_p:.2f}x")


if __name__ == "__main__":
    main()
