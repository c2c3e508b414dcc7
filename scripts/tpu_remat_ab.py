"""A/B the per-layer transformer remat on the full fusion train step.

remat=True recomputes each photometry-encoder layer in the backward
instead of saving the (B, H, 258, 258) score/prob/dropout tensors
(~0.7 GB/layer at B=256). Measures the full jitted train step (loss +
grads + clip + adam, rbg RNG) unchained per the relay rules, plus a
numeric cross-check that both paths produce the same loss.

    nohup python -u scripts/tpu_remat_ab.py > /tmp/remat_ab.log 2>&1 &
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
from __graft_entry__ import _fusion_batch  # noqa: E402
from applecider_tpu.config import load_defaults  # noqa: E402
from applecider_tpu.models.fusion import AppleCiderTask  # noqa: E402
from applecider_tpu.train.optim import with_grad_clip  # noqa: E402

OUT = REPO / "tpu_results" / "remat_ab_r3.jsonl"


def timeit(fn, args, iters=8):
    _block(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return round((time.perf_counter() - t0) / iters * 1e3, 1)


def make_task(remat: bool) -> AppleCiderTask:
    cfg = load_defaults()
    cfg.set("train.compute_dtype", "bfloat16")
    cfg.set("model.BaselineCLS.remat", remat)
    return AppleCiderTask(cfg)


def main() -> None:
    dev = jax.devices()[0]
    rows = []
    for bs in (256, 512):
        batch = tuple(jax.device_put(np.asarray(x), dev) for x in _fusion_batch(bs))
        rng = jax.random.key(1, impl="rbg")
        losses = {}
        for remat in (False, True):
            task = make_task(remat)
            params = jax.device_put(
                task.init(jax.random.PRNGKey(0), _fusion_batch(8))["params"], dev)
            tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
            opt_state = tx.init(params)

            @jax.jit
            def full(params, opt_state, batch, rng, task=task, tx=tx):
                (loss, _), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
                    params, batch, rng, True)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            _, _, loss = full(params, opt_state, batch, rng)
            losses[remat] = float(np.asarray(loss))
            row = {
                "batch": bs, "remat": remat, "device": str(dev), "rng": "rbg",
                "full_step_ms": timeit(full, (params, opt_state, batch, rng)),
                "loss": losses[remat],
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        assert np.isclose(losses[False], losses[True], rtol=1e-5), losses
        print(f"bs={bs}: losses match ({losses[False]:.6f})", flush=True)
    OUT.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
