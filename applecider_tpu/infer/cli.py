"""``applecider-serve``: classify every alert of a raw-data directory.

The production entry (reference README.md:17-19 stream diagram): per-alert
causal featurization + 4-modality fusion, served through the measured
fast path (FusedSpectraStream + LengthBinnedFeeder). Weights resolve from
the most recently trained run under the configured workdir, like the
reference's Hyrax ``infer`` verb.

    applecider-serve --config run.toml --raw_path /data/ztf_objects
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", default=None, help="run TOML (defaults applied otherwise)")
    ap.add_argument("--raw_path", default=None,
                    help="raw L1 data dir (<obj>/{photometry.csv,alerts.npy,spectra.csv}); "
                         "falls back to [serve].data_location")
    ap.add_argument("--workdir", default=None, help="results root (trained runs live here)")
    ap.add_argument("--batch_size", type=int, default=None)
    ap.add_argument("--no-binned", action="store_true",
                    help="arrival-order batches instead of length-binned feeding")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile the configured serving bucket set "
                         "(fills the persistent compile cache on a fresh "
                         "host; see docs/SERVING.md) and exit")
    args = ap.parse_args(argv)

    from applecider_tpu.train.runtime import AppleCiderRuntime

    rt = AppleCiderRuntime(config_file=args.config, workdir=args.workdir)
    if args.batch_size is not None:
        rt.set_config("serve.batch_size", args.batch_size)
    if args.no_binned:
        rt.set_config("serve.binned", False)
    if args.warmup:
        result = rt.warmup()
        print(json.dumps(result))
        return 0
    summary = rt.serve(raw_path=args.raw_path)
    print(json.dumps({
        "n_alerts": summary["n_alerts"],
        "alerts_per_sec": round(summary["alerts_per_sec"], 1),
        "run_dir": str(summary["run_dir"]),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
