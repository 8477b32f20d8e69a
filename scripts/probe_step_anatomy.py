"""Anatomy of the real bench train step, measured ABOVE the tunnel RTT floor.

probe_gather.py exposed a methodology bug in all earlier probes: at
STEPS=256 a whole scan finishes under the ~33ms axon dispatch round-trip,
so "~120ns/row gather" was mostly RTT, not device time (a contiguous
slice "cost" the same 123us/step). This probe uses STEPS=4096 (device
time ~0.5s >> RTT) and subtracts a measured null-scan floor.

Variants (bench shapes: MLP [384->256->128->64->1], B=1024, frozen
100k x 128 user/item tables, trainable 30 x 128 domain table, dropout 0.5,
flat Adam, l2 1e-5):

  floor        null scan body (carry + id readout)
  gathers      3 table gathers + sum, params carried
  fast         real train_step, fused Pallas kernel (bench default)
  autodiff     real train_step, fused_kernel=False
  autodiff-l2=0  isolates the frozen-table l2 forward reduction
  fast-nodrop  fused kernel, dropout 0
  fast-nokeep  fused kernel without the has_data select gating

Run only when the TPU is free:  timeout 3000 python scripts/probe_step_anatomy.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mamdr_tpu.config import ExperimentConfig
from mamdr_tpu.data.synthetic import make_synthetic_dataset
from mamdr_tpu.train.steps import make_train_step
from mamdr_tpu.train.trainer import Trainer

S, B = 4096, 1024
N_UID = N_PID = 100_000


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfg = ExperimentConfig.from_dict(
        {
            "model": {
                "name": "mlp_meta_mamdr_finetune",
                "user_dim": 128,
                "item_dim": 128,
                "domain_dim": 128,
                "hidden_dim": [256, 128, 64],
                "dropout": 0.5,
            },
            "train": {
                "load_pretrain_emb": True,
                "emb_trainable": False,
                "learning_rate": 1e-3,
                "epoch": 1,
            },
            "dataset": {"name": "synthetic", "batch_size": B, "seed": 123},
        }
    )
    ds = make_synthetic_dataset(
        n_domain=30, n_uid=N_UID, n_pid=N_PID, n_per_domain=2048,
        seed=123, long_tail=False, batch_size=B,
    )
    rng = np.random.default_rng(0)
    ds.user_emb = rng.normal(0, 0.1, (N_UID, 128)).astype(np.float32)
    ds.item_emb = rng.normal(0, 0.1, (N_PID, 128)).astype(np.float32)
    trainer = Trainer(cfg, ds, verbose=False)

    stacked = {
        "uid": jnp.asarray(rng.integers(0, N_UID, (S, B)), jnp.int32),
        "pid": jnp.asarray(rng.integers(0, N_PID, (S, B)), jnp.int32),
        "domain": jnp.zeros((S, B), jnp.int32),
        "label": jnp.asarray(rng.integers(0, 2, (S, B)), jnp.float32),
        "weight": jnp.ones((S, B), jnp.float32),
    }

    def timeit(name, fn, *args, floor=0.0):
        try:
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {str(e)[:160]}")
            return None
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn(*args)
            float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
            ts.append(time.time() - t0)
        med = sorted(ts)[1]
        per = (med - floor) / S
        print(
            f"{name:16s}: {med*1000:7.1f}ms total, {per*1e6:7.2f}us/step over floor, "
            f"{B/max(per,1e-12)/1e6:6.2f}M ex/s",
            flush=True,
        )
        return med

    @jax.jit
    def floor_fn():
        def body(c, xs):
            return c + xs["uid"][0].astype(jnp.float32), None
        c, _ = jax.lax.scan(body, jnp.zeros(()), stacked)
        return c

    t_floor = timeit("floor", floor_fn)

    params = trainer.state.params

    @jax.jit
    def gathers_only(p):
        emb = p["model"]["embedding"]

        def body(c, xs):
            u = jnp.take(emb["user_emb"], xs["uid"], axis=0, mode="clip")
            pp = jnp.take(emb["item_emb"], xs["pid"], axis=0, mode="clip")
            d = jnp.take(emb["domain_emb"], xs["domain"], axis=0, mode="clip")
            return c + jnp.sum(u) + jnp.sum(pp) + jnp.sum(d), None

        c, _ = jax.lax.scan(body, jnp.zeros(()), stacked)
        return c

    timeit("gathers", gathers_only, params, floor=t_floor)

    def epoch_of(step):
        @jax.jit
        def run(state):
            new_state, losses = jax.lax.scan(step, state, stacked)
            return jnp.mean(losses), new_state
        return run

    def state_for(step_cfg, tx=None):
        from mamdr_tpu.train.state import TrainState
        tx = tx or trainer.tx
        step, _ = make_train_step(trainer.model, tx, step_cfg)
        st = TrainState.create(
            params=params,
            opt_state=jax.jit(tx.init)(params),
            batch_stats=trainer.state.batch_stats,
            rng=jax.random.PRNGKey(0),
        )
        return step, st

    base = trainer.step_cfg
    step, st = state_for(base)
    timeit("fast", epoch_of(step), st, floor=t_floor)

    step, st = state_for(base._replace(fused_kernel=False))
    timeit("autodiff", epoch_of(step), st, floor=t_floor)

    step, st = state_for(base._replace(fused_kernel=False, l2_emb=0.0))
    timeit("autodiff-l2=0", epoch_of(step), st, floor=t_floor)

    step, st = state_for(base._replace(l2_emb=0.0))
    timeit("fast-l2=0", epoch_of(step), st, floor=t_floor)

    # dropout off: rebuild the loss with rate 0 via a model clone
    import dataclasses
    try:
        model0 = trainer.model.clone(dropout=0.0)
    except Exception:
        model0 = dataclasses.replace(trainer.model, dropout=0.0)
    from mamdr_tpu.train.state import TrainState
    step0, _ = make_train_step(model0, trainer.tx, base._replace(has_dropout=False))
    st0 = TrainState.create(
        params=params,
        opt_state=jax.jit(trainer.tx.init)(params),
        batch_stats=trainer.state.batch_stats,
        rng=jax.random.PRNGKey(0),
    )
    timeit("fast-nodrop", epoch_of(step0), st0, floor=t_floor)

    # no has_data keep-gating: inline step without the selects
    from mamdr_tpu.ops.fused_mlp_step import maybe_make_fast_loss_grad
    import optax
    fast = maybe_make_fast_loss_grad(trainer.model, base)
    tx = trainer.tx

    def step_nokeep(state, batch):
        rng_ = jax.random.fold_in(state.rng, state.step)
        data_loss, grads = fast(state.params, batch, rng_, train=True)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        ), data_loss

    st = TrainState.create(
        params=params,
        opt_state=jax.jit(tx.init)(params),
        batch_stats=trainer.state.batch_stats,
        rng=jax.random.PRNGKey(0),
    )
    timeit("fast-nokeep", epoch_of(step_nokeep), st, floor=t_floor)


if __name__ == "__main__":
    main()
