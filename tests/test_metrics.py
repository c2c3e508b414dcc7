"""Metric suite parity against sklearn (used only as a test oracle)."""

import numpy as np
from sklearn.metrics import (
    average_precision_score,
    confusion_matrix as sk_confusion,
    f1_score,
    roc_auc_score,
)

from applecider_tpu.ops.metrics import (
    accuracy,
    classification_report,
    composite_score,
    confusion_matrix,
    dirichlet_random_pr_auc_baseline,
    macro_auprc,
    macro_f1,
    macro_roc_auc,
    redshift_metrics,
    topk_accuracy,
)


def _fake_probs(rng, n=200, c=5):
    labels = rng.integers(0, c, size=n)
    logits = rng.normal(size=(n, c)) + 2.0 * np.eye(c)[labels]
    probs = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    return probs, labels


def test_accuracy_and_topk(rng):
    probs, labels = _fake_probs(rng)
    acc = accuracy(probs, labels)
    top3 = topk_accuracy(probs, labels, 3)
    assert 0 < acc <= top3 <= 1.0


def test_macro_f1_matches_sklearn(rng):
    probs, labels = _fake_probs(rng)
    preds = probs.argmax(axis=1)
    ours = macro_f1(preds, labels, 5)
    ref = f1_score(labels, preds, average="macro")
    assert abs(ours - ref) < 1e-9


def test_confusion_matches_sklearn(rng):
    probs, labels = _fake_probs(rng)
    preds = probs.argmax(axis=1)
    np.testing.assert_array_equal(confusion_matrix(preds, labels, 5), sk_confusion(labels, preds, labels=range(5)))


def test_roc_auc_matches_sklearn(rng):
    probs, labels = _fake_probs(rng)
    ours = macro_roc_auc(probs, labels)
    ref = roc_auc_score(labels, probs, multi_class="ovr", average="macro")
    assert abs(ours - ref) < 1e-9


def test_auprc_matches_sklearn(rng):
    probs, labels = _fake_probs(rng)
    aps = [average_precision_score(labels == c, probs[:, c]) for c in range(5)]
    assert abs(macro_auprc(probs, labels) - np.mean(aps)) < 1e-9


def test_roc_auc_with_ties():
    scores = np.array([0.5, 0.5, 0.5, 0.7, 0.2])
    labels = np.array([1, 0, 1, 1, 0])
    probs = np.stack([1 - scores, scores], axis=1)
    ref = roc_auc_score(labels, scores)
    ours = macro_roc_auc(probs, labels)
    assert abs(ours - ref) < 1e-9


def test_composite():
    assert abs(composite_score(1.0, 1.0, 1.0) - 1.0) < 1e-12
    assert abs(composite_score(0.5, 0.6, 0.7) - (0.2 + 0.18 + 0.21)) < 1e-12


def test_classification_report_keys(rng):
    probs, labels = _fake_probs(rng)
    rep = classification_report(probs, labels)
    for k in ["accuracy", "top3_accuracy", "macro_f1", "macro_roc_auc", "macro_auprc", "composite"]:
        assert k in rep


def test_redshift_metrics():
    true_z = np.array([0.1, 0.5, 1.0, 2.0])
    pred_z = true_z + np.array([0.01, -0.02, 0.2, 0.0])
    m = redshift_metrics(pred_z, true_z)
    assert m["mae"] > 0 and m["sigma_nmad"] > 0
    assert m["outlier_rate"] == 0.0  # 0.2/(1+1.0)=0.10 is not > 0.15
    # a gross outlier is counted
    m2 = redshift_metrics(true_z + np.array([0.0, 0.0, 0.0, 1.0]), true_z)
    assert m2["outlier_rate"] == 0.25


def test_dirichlet_floor_is_low(rng):
    labels = rng.integers(0, 5, size=100)
    floor = dirichlet_random_pr_auc_baseline(labels, 5, n_trials=20)
    assert 0.05 < floor < 0.6


def test_early_classification_report():
    from applecider_tpu.ops.metrics import early_classification_report

    def p(c):
        v = np.full(3, 0.1, np.float32)
        v[c] = 0.8
        return v

    results = [
        {"object_id": "A", "jd": 1.0, "probs": p(0)},  # wrong early
        {"object_id": "A", "jd": 2.0, "probs": p(1)},  # right late
        {"object_id": "B", "jd": 1.0, "probs": p(2)},
        {"object_id": "B", "jd": 2.0, "probs": p(2)},
        {"object_id": "C", "jd": 5.0, "probs": p(0)},  # unlabeled: ignored
    ]
    rep = early_classification_report(results, {"A": 1, "B": 2})
    assert rep["n_objects"] == 2
    assert rep["accuracy_at_alert_k"] == [0.5, 1.0]
    assert rep["objects_at_alert_k"] == [2, 2]
    assert rep["final_alert_accuracy"] == 1.0
    assert rep["per_alert_accuracy"] == 0.75
    cm = rep["confusion_matrix"]
    assert cm.sum() == 4 and cm[1, 1] == 1 and cm[2, 2] == 2 and cm[1, 0] == 1
