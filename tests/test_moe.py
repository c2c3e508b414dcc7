"""Dense top-k MoE dispatch equals the reference's masked-loop dispatch."""

import numpy as np
import torch

from applecider_tpu.ops.moe import topk_dense_dispatch, topk_mask


def _masked_loop_dispatch(expert_outputs, router_weights, k=2):
    """The reference algorithm (astrominn.py:270-295), re-run in torch."""
    B, E, C = expert_outputs.shape
    out = torch.zeros(B, C, dtype=torch.float64)
    w = torch.tensor(router_weights, dtype=torch.float64)
    eo = torch.tensor(expert_outputs, dtype=torch.float64)
    topk_w, topk_i = torch.topk(w, k=k, dim=-1)
    for e in range(E):
        mask = (topk_i == e).any(dim=-1)
        if mask.any():
            weights = topk_w[mask, (topk_i[mask] == e).nonzero()[:, 1]]
            out[mask] += weights.unsqueeze(-1) * eo[mask, e]
    return out.numpy()


def test_dense_dispatch_matches_masked_loop(rng):
    B, E, C = 32, 4, 5
    expert_outputs = rng.normal(size=(B, E, C)).astype(np.float32)
    router = rng.uniform(0.0, 1.0, size=(B, E)).astype(np.float32)
    ours = np.asarray(topk_dense_dispatch(expert_outputs, router, k=2))
    ref = _masked_loop_dispatch(expert_outputs, router, k=2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_topk_mask_counts(rng):
    router = rng.uniform(size=(16, 4)).astype(np.float32)
    mask = np.asarray(topk_mask(router, 2))
    assert (mask.sum(axis=1) == 2).all()


def test_dense_dispatch_k1(rng):
    expert_outputs = rng.normal(size=(8, 4, 5)).astype(np.float32)
    router = rng.uniform(size=(8, 4)).astype(np.float32)
    ours = np.asarray(topk_dense_dispatch(expert_outputs, router, k=1))
    best = router.argmax(axis=1)
    expected = expert_outputs[np.arange(8), best] * router[np.arange(8), best][:, None]
    np.testing.assert_allclose(ours, expected, atol=1e-5)
