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

    # Measurement note (round 3): feeding step outputs back as inputs —
    # i.e. an actual training loop — costs 45x extra on the axon relay
    # (58 ms -> 2.6 s/step at batch 64; donation makes it 20 s): the relay
    # round-trips the ~1 GB param+opt-state buffers through the host
    # between steps. A local TPU runtime keeps donated state on-device, so
    # the UNCHAINED number is the true device train-step cost and the one
    # reported as alerts_per_sec_training; the chained number is recorded
    # to document the relay pathology.
    # rbg mirrors the Trainer's train.rng_impl="auto" on TPU (threefry
    # dropout bits cost a measured +14.6 ms on the b64 step)
    rng = jax.random.key(1, impl="rbg")
    for bs in (64, 128, 256):
        batch = tuple(jax.device_put(np.asarray(x), dev) for x in _fusion_batch(bs))
        p, o, loss = train_step(params, opt_state, batch, rng)
        _ = float(np.asarray(loss))  # compile + sync
        N = 8
        t0 = time.perf_counter()
        for _ in range(N):
            _p, _o, loss = train_step(params, opt_state, batch, rng)
        _ = float(np.asarray(loss))
        dt = (time.perf_counter() - t0) / N
        t0 = time.perf_counter()
        p, o = params, opt_state
        for _ in range(3):
            p, o, loss = train_step(p, o, batch, rng)
        _ = float(np.asarray(loss))
        dt_chain = (time.perf_counter() - t0) / 3
        print(json.dumps({
            "stage": "train_step", "batch": bs, "ms": round(dt * 1e3, 1),
            "alerts_per_sec_training": round(bs / dt, 1),
            "ms_chained_via_relay": round(dt_chain * 1e3, 1),
            "loss_finite": bool(np.isfinite(float(np.asarray(loss)))),
        }), flush=True)


if __name__ == "__main__":
    main()
