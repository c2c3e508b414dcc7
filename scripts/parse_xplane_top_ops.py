"""Parse a jax.profiler xplane.pb directly and print top HLO ops by self time.

tensorboard_plugin_profile's converter is broken on this image (its
_pywrap_profiler lacks xspace_to_tools_data), so this reads the XSpace proto
via tensorflow.tsl and aggregates device-plane event durations by op name.

Run: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
       python -u scripts/parse_xplane_top_ops.py <trace_dir> [top_n]
"""

from __future__ import annotations

import collections
import glob
import json
import sys


def main():
    trace_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb"))
    if not xs:
        sys.exit(f"no xplane.pb under {trace_dir}/plugins/profile/")
    sp = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        sp.ParseFromString(f.read())

    for plane in sp.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        # line names tell steps vs ops; XLA op events live on "XLA Ops"-like
        # lines. Aggregate every line, report per line.
        for line in plane.lines:
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps
                cnt[name] += 1
            total_ps = sum(tot.values())
            if total_ps == 0:
                continue
            print(json.dumps({
                "line": line.name,
                "total_ms": total_ps / 1e9,
                "n_distinct": len(tot),
            }))
            for name, ps in tot.most_common(top_n):
                print(json.dumps({
                    "op": name[:160],
                    "ms": round(ps / 1e9, 3),
                    "pct": round(100.0 * ps / total_ps, 2),
                    "n": cnt[name],
                }))


if __name__ == "__main__":
    main()
