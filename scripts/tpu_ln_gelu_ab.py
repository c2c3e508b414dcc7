"""On-chip A/B: fused LN+GELU Pallas epilogue (ops/ln_gelu.py) in the b256
fusion train step — the VERDICT r4 #6 "last measured shot" at the
SpectraNet f32 LN/convert HBM residual (KERNEL_NOTES §Round-4 row 1).

Adoption gate: >= 5 ms measured step win -> flip the default; else record
the A/B here + KERNEL_NOTES and close the envelope ledger.

    nohup python -u scripts/tpu_ln_gelu_ab.py > /tmp/ln_gelu_ab.log 2>&1 &

Writes tpu_results/ln_gelu_ab_r5.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def _block(out):
    import jax
    import numpy as np

    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "block_until_ready")]
    leaf = leaves[0]
    idx = tuple(0 for _ in range(getattr(leaf, "ndim", 0)))
    np.asarray(leaf[idx] if idx else leaf)


def measure(mode: str, params, opt_state, batch, rng, task, tx, iters=8):
    import jax
    import numpy as np
    import optax

    if mode:
        os.environ["ACLNGELU"] = mode
    else:
        os.environ.pop("ACLNGELU", None)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(
            task.loss_fn, has_aux=True)(params, batch, rng, True)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    _p, _o, loss = train_step(params, opt_state, batch, rng)
    lv = float(np.asarray(loss))
    compile_s = time.perf_counter() - t0
    assert np.isfinite(lv), f"non-finite loss in mode {mode!r}"
    # timed: queue N unchained steps, sync by scalar fetch of the last
    t0 = time.perf_counter()
    for _ in range(iters):
        _p, _o, loss = train_step(params, opt_state, batch, rng)
    _ = float(np.asarray(loss))
    dt = (time.perf_counter() - t0) / iters
    return {"mode": mode or "xla", "step_ms": round(dt * 1e3, 2),
            "compile_s": round(compile_s, 1), "loss": round(lv, 5)}


def main():
    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from __graft_entry__ import _fusion_batch, _fusion_task
    from applecider_tpu.train.optim import with_grad_clip

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    batch = tuple(jax.device_put(np.asarray(x), dev)
                  for x in _fusion_batch(256))
    params = jax.jit(lambda r: task.init(r, batch)["params"])(
        jax.random.PRNGKey(0))
    _block(params)
    tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
    opt_state = tx.init(params)
    rng = jax.random.key(1, impl="rbg")

    rows = []
    # interleave A/B/A/B to decorrelate relay drift
    for rep in range(2):
        for mode in ("", "pallas"):
            row = measure(mode, params, opt_state, batch, rng, task, tx)
            row["rep"] = rep
            rows.append(row)
            print(row, flush=True)

    out = REPO / "tpu_results" / "ln_gelu_ab_r5.jsonl"
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    xla = min(r["step_ms"] for r in rows if r["mode"] == "xla")
    pal = min(r["step_ms"] for r in rows if r["mode"] == "pallas")
    print(f"best-of: xla {xla} ms vs pallas {pal} ms -> "
          f"{'ADOPT' if xla - pal >= 5.0 else 'tie/no (close the ledger)'}",
          flush=True)


if __name__ == "__main__":
    main()
