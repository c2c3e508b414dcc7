"""On-chip A/B: LayerNorm custom VJP (bf16-lean residuals) vs plain autodiff.

The post-flash-attention b256 train-step trace attributes ~30 ms/step to
f32 LN-chain fusions in SpectraNet's early stages (f32[256,3481,192] /
f32[256,870,*] saved residuals + their backward).  ``layers._ln_apply``
saves only (x, mean, inv) and recomputes xhat inside the backward fusion.
This script times the full fusion train step (loss+grad+adam, bf16, rbg)
with ``layers._LN_IMPL`` = "autodiff" vs "vjp" at b256 and b1024, after
fetching loss equality evidence first (relay rule: compare BEFORE timing).

Run: nohup python -u scripts/tpu_ln_vjp_ab.py > /tmp/ln_ab.log 2>&1 &
Writes tpu_results/ln_vjp_ab_r3.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "tpu_results", "ln_vjp_ab_r3.jsonl")
rows = []


def emit(**kw):
    rows.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    emit(device=str(dev))

    from __graft_entry__ import _fusion_batch, _fusion_task
    from applecider_tpu.models import layers
    from applecider_tpu.train.optim import with_grad_clip

    rng_key = jax.random.key(1, impl="rbg")
    for impl in ("autodiff", "vjp"):
        layers._LN_IMPL = impl
        task = _fusion_task(tiny=False, compute_dtype="bfloat16")
        params = jax.device_put(
            task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))["params"],
            dev)
        tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, batch, rng, task=task, tx=tx):
            (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
                params, batch, rng, True)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for bs in (256, 1024):
            batch = tuple(jax.device_put(np.asarray(x), dev)
                          for x in _fusion_batch(bs))
            _p, _o, loss = train_step(params, opt_state, batch, rng_key)
            loss0 = float(np.asarray(loss))  # compile + sync + compare first
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                _p, _o, loss = train_step(params, opt_state, batch, rng_key)
            _ = float(np.asarray(loss))
            dt = (time.perf_counter() - t0) / iters
            emit(stage="train_step", ln_impl=impl, batch=bs,
                 ms=round(dt * 1e3, 1),
                 alerts_per_sec_training=round(bs / dt, 1),
                 loss=round(loss0, 6), loss_finite=bool(np.isfinite(loss0)))

    layers._LN_IMPL = None
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
