"""Dense top-k mixture-of-experts dispatch.

The reference's MoE (``src/applecider/models/astrominn.py:270-295``) loops
over experts with boolean masks — dynamic shapes that break XLA tracing and
ONNX export (the reference notebook documents the failure). With 4 tiny MLP
experts the TPU-native answer is *dense* dispatch: run every expert on every
sample (a single batched matmul on the MXU) and combine with a top-k-masked
weight matrix. Numerically identical to masked dispatch, fully static.

For expert parallelism, the stacked expert weight tensors (leading axis =
experts) can be sharded over a mesh ``model`` axis; XLA inserts the
all-reduce for the weighted combine automatically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def topk_mask(weights: jax.Array, k: int) -> jax.Array:
    """Boolean mask of the top-k entries per row, shape (B, E).

    Ties broken toward lower expert index (matches torch.topk ordering).
    """
    _, idx = jax.lax.top_k(weights, k)
    return jnp.zeros_like(weights, dtype=bool).at[
        jnp.arange(weights.shape[0])[:, None], idx
    ].set(True)


def topk_dense_dispatch(expert_outputs: jax.Array, router_weights: jax.Array, k: int = 2) -> jax.Array:
    """Combine per-expert outputs with top-k-masked router weights.

    Parameters
    ----------
    expert_outputs : (B, E, C) — every expert evaluated on every sample.
    router_weights : (B, E)   — unnormalized gate values (reference uses sigmoid).
    k : number of experts each sample routes to.

    Returns (B, C): ``sum_e w[b,e] * out[b,e,:]`` over the top-k experts.
    """
    mask = topk_mask(router_weights, k)
    gated = jnp.where(mask, router_weights, 0.0).astype(expert_outputs.dtype)
    return jnp.einsum("be,bec->bc", gated, expert_outputs)
