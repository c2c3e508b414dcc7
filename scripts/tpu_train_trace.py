"""Capture a profiler trace of the full fusion TRAIN step (loss+grad+adam),
then print the top HLO ops by self time.

The inference forward has been op-profiled (scripts/tpu_profile_forward.py,
KERNEL_NOTES "Fusion forward profile"); the backward never has. Train MFU is
21.5% at b256 (tpu_results/bench_r3_buckets.json) — this probe attributes it.

Run: python -u scripts/tpu_train_trace.py [batch] [outdir]
"""

from __future__ import annotations

import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/train_trace"
    import jax
    import optax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "batch": bs}), flush=True)

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

    rng = jax.random.key(1, impl="rbg")
    batch = tuple(jax.device_put(np.asarray(x), dev) for x in _fusion_batch(bs))
    p, o, loss = train_step(params, opt_state, batch, rng)
    _ = float(np.asarray(loss))  # compile + sync

    with jax.profiler.trace(out):
        for _ in range(4):
            _, _, loss = train_step(params, opt_state, batch, rng)
        _ = float(np.asarray(loss))
    print(json.dumps({"trace": out}), flush=True)

    xs = sorted(glob.glob(os.path.join(out, "plugins/profile/*/*.xplane.pb")))
    if not xs:
        print(json.dumps({"error": "no xplane.pb found"}))
        return
    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            from tensorboard_plugin_profile.convert import raw_to_tool_data

            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xs[-1]], tool, {"tqx": "out:csv"}
            )
            path = os.path.join(out, f"{tool}.csv")
            with open(path, "w") as f:
                f.write(data if isinstance(data, str) else data.decode())
            print(json.dumps({f"{tool}_csv": path}), flush=True)
        except Exception as e:
            print(json.dumps({f"{tool}_error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
