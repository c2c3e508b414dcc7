"""REAL multi-process execution of the multi-host path (VERDICT r4 #2).

Launches 2 separate JAX processes (``jax.distributed.initialize`` against a
local coordinator, 1 virtual CPU device each → a 2-device global mesh) and
runs the full runtime verbs through ``parallel/multihost.py``, then compares
against a single-process reference on the same corpus:

* train losses and eval metrics equal the 1-process run (the global batch
  covers the whole epoch, so stride-interleaving is a within-batch
  permutation — loss/grad are permutation-invariant);
* both workers broadcast ONE run dir (``broadcast_str``);
* orbax collective save + restore executes across processes (train() saves,
  infer() restores);
* ``Trainer.predict`` returns dataset-ordered rows equal to the reference,
  including with a stride that forces drop_last + leftover recovery
  (ADVICE r4 medium).

Everything before round 5 exercised only the ``process_count()==1`` no-op
form of these hooks; this test pins the pod-latent fixes by execution.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(args: dict, n_local_devices: int) -> subprocess.Popen:
    env = dict(os.environ)
    for k in list(env):
        if k.startswith("PALLAS_AXON") or k.startswith("AXON_"):
            env.pop(k)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_applecider_tests")
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
         json.dumps(args)],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from applecider_tpu.datasets.photo_dataset import compute_photo_feature_stats
    from applecider_tpu.preprocessing.cli import preprocess_data
    from applecider_tpu.testing import make_corpus

    root = tmp_path_factory.mktemp("mh2")
    data_dir, labels_csv = make_corpus(root, n_objects=12, seed=21,
                                       n_photometry=18, n_alerts=4)
    out = root / "out"
    preprocess_data(str(data_dir), str(labels_csv), str(out),
                    min_per_class=1, seed=42)
    compute_photo_feature_stats(out / "manifest_train.csv", 100.0,
                                out / "photo_stats.npz")
    return out


@pytest.mark.slow
def test_two_process_trainer_matches_single_process(corpus, tmp_path):
    base = {
        "manifest": str(corpus / "manifest_train.csv"),
        "stats": str(corpus / "photo_stats.npz"),
    }

    # reference: ONE process, 2 local devices (same 2-device global mesh),
    # global batch 8 covers the whole 8-sample train manifest per step
    ref_args = dict(base, role="ref", batch_size=8, port=0,
                    workdir=str(tmp_path / "ref"),
                    out_json=str(tmp_path / "ref.json"))
    proc = _spawn(ref_args, n_local_devices=2)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, f"ref run failed:\n{out[-3000:]}"

    port = _free_port()
    workers = []
    for pid in range(2):
        wargs = dict(base, role="worker", process_id=pid, num_processes=2,
                     port=port, batch_size=4,  # per-host; global 8
                     workdir=str(tmp_path / "mh"),
                     out_json=str(tmp_path / f"worker{pid}.json"))
        workers.append(_spawn(wargs, n_local_devices=1))
    outs = [w.communicate(timeout=600)[0] for w in workers]
    for w, o in zip(workers, outs):
        assert w.returncode == 0, f"worker failed:\n{o[-3000:]}"

    ref = json.loads((tmp_path / "ref.json").read_text())
    w0 = json.loads((tmp_path / "worker0.json").read_text())
    w1 = json.loads((tmp_path / "worker1.json").read_text())

    assert w0["process_count"] == 2 and w1["process_count"] == 2

    # ONE broadcast run dir; identical control flow on both workers
    assert w0["run_dir"] == w1["run_dir"]
    assert w0["losses"] == pytest.approx(w1["losses"], rel=1e-6)

    # losses/metrics equal the single-process run (within-batch permutation)
    assert w0["losses"] == pytest.approx(ref["losses"], rel=2e-5, abs=1e-6)
    assert w0["val_loss"] == pytest.approx(ref["val_loss"], rel=2e-5, abs=1e-6)
    assert w0["val_acc"] == pytest.approx(ref["val_acc"], abs=1e-9)

    # predict: dataset-ordered rows equal the reference on BOTH workers,
    # for the even stride and the odd (drop_last + leftover) stride
    for key in ("preds", "preds_odd"):
        r = np.asarray(ref[key])
        a0, a1 = np.asarray(w0[key]), np.asarray(w1[key])
        assert a0.shape == r.shape, f"{key}: {a0.shape} vs {r.shape}"
        np.testing.assert_allclose(a0, r, rtol=2e-5, atol=1e-6, err_msg=key)
        np.testing.assert_allclose(a1, r, rtol=2e-5, atol=1e-6, err_msg=key)

    # the shared run dirs got exactly one metrics.jsonl writer
    mh_runs = sorted((tmp_path / "mh").glob("*-train-*"))
    assert len(mh_runs) == 1, "workers must share ONE broadcast run dir"
    lines = (mh_runs[0] / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2  # one record per epoch, no duplication
