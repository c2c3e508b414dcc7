"""Numeric parity of the loss zoo against torch reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from applecider_tpu.ops.losses import (
    class_balanced_weights,
    cross_entropy,
    dice_loss,
    focal_loss,
    multiclass_bce_loss,
)


def _torch_focal(logits, target, gamma=2.0, alpha=None, eps=0.0):
    """Reference focal loss semantics (HyraxBaselineCLS.py:169-191)."""
    logits = torch.tensor(logits)
    target = torch.tensor(target)
    B, C = logits.shape
    logp = F.log_softmax(logits, dim=1)
    p = logp.exp()
    if eps > 0:
        y = torch.full_like(logp, eps / (C - 1))
        y.scatter_(1, target.unsqueeze(1), 1.0 - eps)
    else:
        y = F.one_hot(target, num_classes=C).float()
    w = (1.0 - p).pow(gamma)
    if alpha is not None:
        w = w * torch.tensor(alpha).view(1, C)
    return float((-(y * w * logp).sum(dim=1)).mean())


@pytest.mark.parametrize("gamma,eps", [(2.0, 0.0), (1.5, 0.1), (0.0, 0.0)])
def test_focal_loss_matches_torch(rng, gamma, eps):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=16)
    ours = float(focal_loss(logits, labels, gamma=gamma, eps=eps))
    ref = _torch_focal(logits, labels, gamma=gamma, eps=eps)
    assert abs(ours - ref) < 1e-5


def test_focal_loss_alpha(rng):
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=8)
    alpha = np.array([1.0, 2.0, 0.5, 1.5, 1.0], dtype=np.float32)
    ours = float(focal_loss(logits, labels, alpha=alpha))
    ref = _torch_focal(logits, labels, alpha=alpha)
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_int_labels(rng):
    logits = rng.normal(size=(16, 9)).astype(np.float32)
    labels = rng.integers(0, 9, size=16)
    ours = float(cross_entropy(logits, labels))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels)))
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_weighted(rng):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=16)
    w = rng.uniform(0.5, 2.0, size=5).astype(np.float32)
    ours = float(cross_entropy(logits, labels, weight=w))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(w)))
    assert abs(ours - ref) < 1e-5


def test_cross_entropy_one_hot_targets(rng):
    """The reference feeds one-hot float targets to torch CE (astrominn.py:315)."""
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=16)
    one_hot = np.eye(5, dtype=np.float32)[labels]
    ours = float(cross_entropy(logits, one_hot))
    ref = float(F.cross_entropy(torch.tensor(logits), torch.tensor(one_hot)))
    assert abs(ours - ref) < 1e-5


def test_multiclass_bce_matches_torch(rng):
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=16)
    one_hot = np.eye(5, dtype=np.float32)[labels]
    ours = float(multiclass_bce_loss(logits, labels))
    ref = float(
        F.binary_cross_entropy_with_logits(
            torch.tensor(logits), torch.tensor(one_hot), reduction="none"
        ).sum(-1).mean()
    )
    assert abs(ours - ref) < 1e-5


def test_dice_loss_bounds(rng):
    logits = rng.normal(size=(32, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=32)
    val = float(dice_loss(logits, labels))
    assert 0.0 <= val <= 1.0
    # perfect predictions drive dice loss toward 0
    perfect = np.eye(5, dtype=np.float32)[labels] * 100.0
    assert float(dice_loss(perfect, labels)) < 0.1


def test_class_balanced_weights():
    w = class_balanced_weights([1000, 100, 10])
    assert w.shape == (3,)
    assert w[2] > w[1] > w[0]
    assert abs(w.sum() - 3.0) < 1e-5
