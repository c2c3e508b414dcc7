"""Capture a fresh profiler trace of the forward + preprocess (current code),
then print the top HLO ops by self time via tensorboard_plugin_profile.

Run: python -u scripts/tpu_profile_forward.py [batch] [outdir]
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
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fwd_trace"
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "batch": bs}), flush=True)

    from __graft_entry__ import _fusion_batch, _fusion_task
    from applecider_tpu.infer.stream import AlertStreamPipeline, pack_alert_batch
    from bench import BUCKETS, make_stream_samples

    task = _fusion_task(tiny=False, compute_dtype="bfloat16")
    params = jax.device_put(
        task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))["params"], dev
    )
    m = task.module
    fullj = jax.jit(lambda p, *a: m.apply({"params": p}, *a, deterministic=True))
    args = tuple(jax.device_put(x, dev) for x in _fusion_batch(batch_size=bs)[:5])
    _ = np.asarray(fullj(params, *args))[:1]  # compile+sync

    pipe = AlertStreamPipeline(task)
    raw = pack_alert_batch(make_stream_samples(bs, seed=1), length_buckets=BUCKETS)
    placed = {k: jax.device_put(v, dev) for k, v in raw.items()}
    _ = np.asarray(pipe(params, placed))[:1]  # compile+sync

    with jax.profiler.trace(out):
        o = None
        for _ in range(6):
            o = fullj(params, *args)
        _ = np.asarray(o[:1, :1])
        for _ in range(6):
            o = pipe(params, placed)
        _ = np.asarray(o[:1, :1])
    print(json.dumps({"trace": out}), flush=True)

    # ---- parse: top HLO ops by self time
    xs = sorted(glob.glob(os.path.join(out, "plugins/profile/*/*.xplane.pb")))
    if not xs:
        print(json.dumps({"error": "no xplane.pb found"}))
        return
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xs[-1]], "framework_op_stats", {"tqx": "out:csv"}
        )
        path = os.path.join(out, "op_stats.csv")
        with open(path, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print(json.dumps({"op_stats_csv": path}), flush=True)
    except Exception as e:
        print(json.dumps({"op_stats_error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
    try:
        from tensorboard_plugin_profile.convert import raw_to_tool_data

        data, _ = raw_to_tool_data.xspace_to_tool_data(
            [xs[-1]], "hlo_stats", {"tqx": "out:csv"}
        )
        path = os.path.join(out, "hlo_stats.csv")
        with open(path, "w") as f:
            f.write(data if isinstance(data, str) else data.decode())
        print(json.dumps({"hlo_stats_csv": path}), flush=True)
    except Exception as e:
        print(json.dumps({"hlo_stats_error": f"{type(e).__name__}: {e}"[:300]}), flush=True)


if __name__ == "__main__":
    main()
