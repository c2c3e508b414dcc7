"""Production alert-stream serving quickstart on a synthetic corpus.

The reference's production shape (README.md:17-19 ZTF diagram;
``brew_cider.py:1134-1193`` per-alert evaluation): every alert of every
object classified causally — photometry cut at the alert's jd, spectrum
attached only once taken — through the measured serving stack
(FusedSpectraStream + LengthBinnedFeeder), optionally int8-quantized.

    python docs/examples/serve_quickstart.py /tmp/ac_serve
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main(root: Path):
    import jax
    import numpy as np

    from applecider_tpu.infer.serve import iter_alert_samples, serve_alert_stream
    from applecider_tpu.models.fusion import AppleCiderTask
    from applecider_tpu.config import load_defaults
    from applecider_tpu.testing import make_corpus

    root.mkdir(parents=True, exist_ok=True)
    data_dir, _ = make_corpus(root, n_objects=6, seed=11, n_photometry=30, n_alerts=6)

    # a trained checkpoint would come from AppleCiderRuntime.train(); here a
    # fresh init of a small config keeps the example fast anywhere (swap in
    # load_defaults() unchanged for the full-scale paper model)
    cfg = load_defaults()
    cfg.set("train.compute_dtype", "float32")
    cfg.set("model.BaselineCLS.d_model", 16)
    cfg.set("model.BaselineCLS.n_heads", 2)
    cfg.set("model.BaselineCLS.n_layers", 1)
    cfg.set("model.SpectraNet.channels", [4, 8])
    cfg.set("model.SpectraNet.depths", [1, 1])
    cfg.set("model.SpectraNet.kernel_sizes_per_stage", [[3, 7], [3, 5]])
    cfg.set("model.AstroMiNN.backbone_depths", [1, 1])
    cfg.set("model.AstroMiNN.backbone_dims", [8, 16])
    grid = np.linspace(4500, 7980, 128, dtype=np.float32)
    task = AppleCiderTask(cfg)
    variables = task.init(
        jax.random.PRNGKey(0),
        (np.zeros((2, 32, 7), np.float32), np.zeros((2, 32), bool),
         np.zeros((2, 24), np.float32), np.zeros((2, 63, 63, 3), np.float32),
         np.zeros((2, len(grid)), np.float32), np.zeros(2, np.int64)),
    )

    out = root / "alerts.jsonl"
    summary = serve_alert_stream(
        task, variables["params"], iter_alert_samples(data_dir),
        batch_size=8, wave_grid=grid, out_jsonl=out,
    )
    print(f"served {summary['n_alerts']} alerts "
          f"({summary['alerts_per_sec']:.1f} alerts/s) -> {out}")
    top = summary["results"][0]
    print("first alert:", top["object_id"], "jd", round(top["jd"], 3),
          "probs", np.round(top["probs"], 3).tolist())


if __name__ == "__main__":
    root = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp())
    main(root)
