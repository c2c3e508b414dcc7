"""Categorized op-time reconciliation of the b256 fusion train step.

Reads a jax.profiler xplane trace of ``jit_train_step`` (captured by
``scripts/tpu_train_trace.py``) and buckets EVERY device-op's self time
into model-part categories by HLO name/shape patterns, so the step time
is reconciled op-by-op (VERDICT r3 'do this' #2: where do the non-MXU
milliseconds go). Prints one JSON line per category plus the residual;
the sum equals the measured step wall time by construction.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python -u scripts/tpu_train_sol.py /tmp/train_trace_r4
"""

from __future__ import annotations

import collections
import glob
import json
import re
import sys

RULES = (
    # (category, regex over the full HLO op string)
    ("flash_attention", r"%self_attn"),
    # SpectraNet stage activations: length axis 3481/3480/870/868/217/216/54/13
    # (conv-visible lengths incl. the +pad variants), or conv-dW outputs shaped
    # [K, Cin, Cout] with K in the stage kernel sets
    ("spectranet", r"\[256,34(8[018])|\[256,8(68|70)|\[256,21[67]|\[256,5[34],"
                   r"|\[256,109,|\[256,1[34],|\[(1021|251|61|31|15|13|11|7|3),\d+,\d+\]"),
    # ConvNeXt: NHWC rank-4 activations at its spatial sizes
    ("convnext", r"\[256,(63,63|15,15|7,7|3,3),"),
    # photometry transformer (L=257+CLS=258) non-attention pieces
    ("transformer", r"\[256,8,258|\[256,258,"),
    ("rng", r"rng-bit|rng_bit"),
    ("copies", r"^%copy|copy-start|copy-done| copy\("),
    ("while_loops", r"^%while"),
)


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace_r4"
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not xs:
        sys.exit(f"no xplane.pb under {trace_dir}")
    sp = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        sp.ParseFromString(f.read())

    for plane in sp.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        steps = 0
        for line in plane.lines:
            if line.name == "Steps":
                steps = len(line.events)
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            cat_ms = collections.Counter()
            cat_top: dict = collections.defaultdict(collections.Counter)
            total_ps = 0
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                total_ps += ev.duration_ps
                for cat, pat in RULES:
                    if re.search(pat, name):
                        cat_ms[cat] += ev.duration_ps
                        cat_top[cat][name[:110]] += ev.duration_ps
                        break
                else:
                    cat_ms["other"] += ev.duration_ps
                    cat_top["other"][name[:110]] += ev.duration_ps
            n = max(steps, 1)
            print(json.dumps({"steps": steps,
                              "step_ms": round(total_ps / 1e9 / n, 2)}))
            for cat, ps in cat_ms.most_common():
                print(json.dumps({
                    "category": cat,
                    "ms_per_step": round(ps / 1e9 / n, 2),
                    "pct": round(100.0 * ps / total_ps, 1),
                }))
            if "--top" in sys.argv:
                for cat, tops in cat_top.items():
                    for name, ps in tops.most_common(6):
                        print(json.dumps({"cat": cat, "ms": round(ps / 1e9 / n, 2),
                                          "op": name}))


if __name__ == "__main__":
    main()
