"""Per-alert logit-sequence datasets (late-fusion stacking).

Behavioral contract from the reference
(``_archive/AppleCider/preprocess/data_loader.py:84-146``): datasets over
precomputed per-alert logit sequences — each object contributes a
(T, D) sequence of per-alert model outputs (e.g. (10, 12) or (10, 2)),
padded/truncated to a fixed T, used to train a sequence-level combiner.

Native storage is an npz table {sequences (object-ragged list), labels};
``.pt`` tables load via torch when present.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from applecider_tpu.registry import register_dataset


@register_dataset(name="LogitSequenceDataset")
class LogitSequenceDataset:
    SECTION = "applecider_tpu.datasets.logit_sequence_dataset.LogitSequenceDataset"

    def __init__(self, config, data_location, max_len: int = 10):
        section = config.section("data_set", self.SECTION)
        self.max_len = int(section.get("max_len", max_len))
        path = Path(data_location)
        if path.suffix == ".pt":
            import torch

            table = torch.load(path, weights_only=False)
            self._seqs = [np.asarray(s, np.float32) for s in table["sequences"]]
            self._labels = np.asarray(table["labels"], np.int64)
        else:
            with np.load(path, allow_pickle=True) as npz:
                self._seqs = [np.asarray(s, np.float32) for s in npz["sequences"]]
                self._labels = np.asarray(npz["labels"], np.int64)

    def __len__(self) -> int:
        return len(self._seqs)

    def sample(self, idx: int) -> dict:
        seq = self._seqs[idx][: self.max_len]
        return {"sequence": seq, "label": int(self._labels[idx])}

    def collate(self, samples: list[dict]) -> dict:
        dim = samples[0]["sequence"].shape[-1]
        batch = np.zeros((len(samples), self.max_len, dim), np.float32)
        mask = np.ones((len(samples), self.max_len), bool)
        for i, s in enumerate(samples):
            n = len(s["sequence"])
            batch[i, :n] = s["sequence"]
            mask[i, :n] = False
        return {
            "data": {
                "sequence": batch,
                "pad_mask": mask,
                "label": np.asarray([s["label"] for s in samples], np.int64),
            }
        }
