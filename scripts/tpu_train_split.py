"""Split the fusion train step: forward vs value_and_grad vs full update.

Documents where the 136.7 ms (batch 256, rbg RNG) train step goes:
forward-only, loss+grads (backward), and grads+optimizer update, all
unchained per the relay measurement rules.

    nohup python -u scripts/tpu_train_split.py > /tmp/train_split.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from bench import _block  # noqa: E402
from __graft_entry__ import _fusion_batch, _fusion_task  # noqa: E402
from applecider_tpu.train.optim import with_grad_clip  # noqa: E402

OUT = REPO / "tpu_results" / "train_split_r3.jsonl"


def timeit(fn, args, iters=8):
    _block(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return round((time.perf_counter() - t0) / iters * 1e3, 1)


def main() -> None:
    dev = jax.devices()[0]
    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = jax.device_put(
        task.init(jax.random.PRNGKey(0), _fusion_batch(8))["params"], dev)
    tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
    opt_state = tx.init(params)
    bs = 256
    batch = tuple(jax.device_put(np.asarray(x), dev) for x in _fusion_batch(bs))
    rng = jax.random.key(1, impl="rbg")

    @jax.jit
    def fwd_loss(params, batch, rng):
        return task.loss_fn(params, batch, rng, True)[0]

    @jax.jit
    def fwd_loss_nodrop(params, batch, rng):
        return task.loss_fn(params, batch, rng, False)[0]

    @jax.jit
    def vag(params, batch, rng):
        (loss, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            params, batch, rng, True)
        return loss, grads

    @jax.jit
    def full(params, opt_state, batch, rng):
        (loss, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            params, batch, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = fwd_loss(params, batch, rng)
    assert np.isfinite(float(np.asarray(loss)))
    row = {
        "batch": bs, "device": str(dev), "rng": "rbg",
        "fwd_loss_train_ms": timeit(fwd_loss, (params, batch, rng)),
        "fwd_loss_eval_ms": timeit(fwd_loss_nodrop, (params, batch, rng)),
        "value_and_grad_ms": timeit(vag, (params, batch, rng)),
        "full_step_ms": timeit(full, (params, opt_state, batch, rng)),
    }
    print(json.dumps(row), flush=True)
    OUT.write_text(json.dumps(row) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
