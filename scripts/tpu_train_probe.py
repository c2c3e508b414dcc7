"""Training-step throughput on TPU: jitted fusion loss+grad+adam, chain-timed.

Evidence for the training path's on-chip performance (the headline bench
covers inference only). Run: python -u scripts/tpu_train_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev)}), flush=True)

    from __graft_entry__ import _fusion_batch, _fusion_task
    from applecider_tpu.train.optim import with_grad_clip

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = jax.device_put(
        task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))["params"], dev
    )
    tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            params, batch, rng, True
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = jax.random.PRNGKey(1)
    for bs in (64, 128, 256):
        batch = tuple(jax.device_put(np.asarray(x), dev) for x in _fusion_batch(bs))
        p, o = params, opt_state
        p, o, loss = train_step(p, o, batch, rng)
        _ = float(np.asarray(loss))  # compile + sync
        N = 10
        t0 = time.perf_counter()
        for _ in range(N):
            p, o, loss = train_step(p, o, batch, rng)
        _ = float(np.asarray(loss))  # params chain forces serial execution
        dt = (time.perf_counter() - t0) / N
        print(json.dumps({
            "stage": "train_step", "batch": bs, "ms": round(dt * 1e3, 1),
            "alerts_per_sec_training": round(bs / dt, 1),
            "loss_finite": bool(np.isfinite(float(np.asarray(loss)))),
        }), flush=True)


if __name__ == "__main__":
    main()
