"""Per-stage SpectraNet forward timing at the frac-0.3 b1024 block shape.

The compact spectra block at 307 rows is ~half the frac-0.3 serving step;
this ranks its five conv stages (channels 64..1024, kernels up to 1021
over 3481 bins) so kernel work targets the real hot stage. Honest relay
sync per KERNEL_NOTES measurement rules.

Run: nohup python -u scripts/tpu_spectranet_stages.py > /tmp/sn_stages.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from bench import _block, _timed_loop  # noqa: E402
from applecider_tpu.models.spectranet import SpectraBlock  # noqa: E402

OUT = REPO / "tpu_results" / "spectranet_stages_r3.jsonl"
ROWS, ITERS = 308, 16  # 307 spectra + zero row, bucketed
CHANNELS = (64, 128, 256, 512, 1024)
KS = ((3, 61, 1021), (3, 31, 251), (3, 15, 61), (3, 11, 31), (3, 7, 13))


def main() -> None:
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    rows = []

    def emit(**kw):
        kw["device"] = str(dev)
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    L, cin = 3481, 1
    x = jnp.asarray(rng.normal(size=(ROWS, L, cin)), jnp.bfloat16)
    x = jax.device_put(x, dev)
    total = 0.0
    for s in range(5):
        is_last = s == 4
        block = SpectraBlock(out_channels=CHANNELS[s], kernel_sizes=KS[s],
                             do_pool=not is_last, dtype=jnp.bfloat16)
        params = block.init(jax.random.PRNGKey(s), x)["params"]
        params = jax.device_put(params, dev)
        fn = jax.jit(lambda p, x_, block=block: block.apply({"params": p}, x_))
        y = fn(params, x)
        _block(y)
        ms = round(_timed_loop(fn, [(params, x)], ITERS) / ITERS * 1e3, 2)
        flops = 2 * ROWS * L * sum(KS[s]) * cin * CHANNELS[s]
        emit(stage=s, L=L, cin=cin, cout=CHANNELS[s], kernels=list(KS[s]),
             ms=ms, tflops=round(flops / ms / 1e9, 1))
        total += ms
        x = y
        L, cin = x.shape[1], x.shape[2]
    emit(stage="total_convs", ms=round(total, 2), rows=ROWS)
    OUT.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
