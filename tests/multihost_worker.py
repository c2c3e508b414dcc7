"""Subprocess body for the REAL 2-process multi-host test.

Launched by ``test_multihost_2proc.py`` with a JSON args blob:
role "ref" runs the single-process reference (all local devices), role
"worker" initializes ``jax.distributed`` against a local coordinator and
runs the SAME runtime verbs through the multi-host code paths
(``parallel/multihost.py``): strided loader, ``broadcast_str`` run dir,
``host_local_batch_to_global``, ``allgather_host_rows`` eval metrics,
orbax collective save/restore, and ``Trainer.predict``'s shard-plan
inversion. Results are written to ``out_json`` for the parent to compare.
"""

import json
import sys


def main(args: dict) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    if args["role"] == "worker":
        # BEFORE any backend touch, so jax.devices() is the GLOBAL set
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args['port']}",
            num_processes=args["num_processes"],
            process_id=args["process_id"],
        )
    import numpy as np

    from applecider_tpu.datasets.loader import DataLoader
    from applecider_tpu.datasets.photo_dataset import PhotoEventsDataset
    from applecider_tpu.train.runtime import AppleCiderRuntime

    multi = args["role"] == "worker"
    overrides = {
        "model": {"name": "BaselineCLS", "BaselineCLS": {
            "d_model": 16, "n_heads": 2, "n_layers": 1, "dropout": 0.0}},
        "train": {"epochs": 2, "compute_dtype": "float32", "seed": 7},
        "data_loader": {"batch_size": args["batch_size"], "seed": 11,
                        "drop_last": False},
        "model_inputs": {p: {"data": {"dataset_class": "PhotoEventsDataset"}}
                         for p in ("train", "validate", "infer")},
    }
    if multi:
        overrides["parallel"] = {"multihost": {
            "enable": True,
            "coordinator_address": f"127.0.0.1:{args['port']}",
            "num_processes": args["num_processes"],
            "process_id": args["process_id"],
        }}
    rt = AppleCiderRuntime(overrides=overrides, workdir=args["workdir"])
    sec = f'data_set."{PhotoEventsDataset.SECTION}"'
    rt.set_config(f"{sec}.manifest_path", args["manifest"])
    rt.set_config(f"{sec}.stats_path", args["stats"])
    rt.set_config(f"{sec}.use_oversampling", False)

    rt.prepare()
    res = rt.train()
    preds = rt.infer()

    # exercise the leftover-recovery path explicitly: a stride whose
    # common shard length is NOT a multiple of batch_size (auto
    # drop_last) leaves tail rows no shard emits
    ds = rt.datasets["infer"]
    from applecider_tpu.train.trainer import Trainer

    task = rt._task()
    params, trainer, _ = rt._restore_latest_params(task)
    odd_loader = DataLoader(
        ds, batch_size=3, shuffle=False, drop_last=False,
        num_shards=jax.process_count(), shard_index=jax.process_index())
    preds_odd = trainer.predict(params, odd_loader)

    out = {
        "process_count": jax.process_count(),
        "losses": [h["train_loss"] for h in res["history"]],
        "val_acc": [h.get("val_accuracy") for h in res["history"]],
        "val_loss": [h.get("val_loss") for h in res["history"]],
        "run_dir": str(res["run_dir"]),
        "preds": np.asarray(preds, np.float64).tolist(),
        "preds_odd": np.asarray(preds_odd, np.float64).tolist(),
        "n_dataset": len(ds),
    }
    with open(args["out_json"], "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main(json.loads(sys.argv[1]))
