"""TPU-efficient dropout.

``flax.linen.Dropout`` draws f32 uniforms via ``jax.random.bernoulli``: under
jit on TPU that lowers to a u32 ``rng-bit-generator`` over the full mask shape
plus a float convert/compare chain, and XLA's layout assignment inserts a raw
u32 transpose-copy between the generator and the compare. On the b256 fusion
train step this machinery measured **34 ms of the 131 ms step** (generation
3.3 ms + u32 layout copies 12.9 ms + threshold compares 21.7 ms/step,
dominated by the four (B, H, L, L) attention-probs masks —
``scripts/tpu_train_trace.py`` + ``parse_xplane_top_ops.py``).

``FastDropout`` draws **8-bit** bits and thresholds in the integer domain:
a quarter of the RNG traffic end-to-end and no float conversion. The drop
probability is quantized to 1/256 (|Δp| ≤ 1/512; the inverted scale is
computed from the integer threshold, so the estimator stays exactly unbiased
for the realized drop rate — dropout is stochastic regularization and the
quantization sits far below seed-to-seed variance; rates below 1/512 round
to a no-op). Semantics otherwise match ``torch.nn.Dropout`` /
``flax.linen.Dropout``: train-time inverted scaling, identity when
``deterministic`` or ``rate == 0``.

Measured on-chip (v5e, b256 fusion train step, rbg): 136.7 -> 127.8 ms with
u16 bits; u8 bits shave the remaining raw-bits layout copies further (see
tpu_results/train_step_fastdrop.jsonl).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class FastDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout(rate)(x, deterministic=...)``."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        # drop iff bits < thresh: P(drop) = thresh / 2^8
        thresh = int(round(float(self.rate) * 256.0))
        if thresh >= 256:  # rate rounds to 1: drop everything
            return jnp.zeros_like(x)
        if thresh == 0:  # rate < 1/512 rounds to a no-op: skip the RNG
            return x
        rng = self.make_rng("dropout")
        # A layout transpose-copy of the raw bits remains between
        # rng-bit-generator and the consumer (~2.6 ms/step per u16
        # (B,H,L,L) mask at b256); generating FLAT bits + reshape was
        # A/B'd on chip and did NOT remove it (129.3 vs 127.8 ms step) —
        # XLA pins the generator layout either way, so keep the direct
        # shape and shrink the bits instead.
        bits = jax.random.bits(rng, x.shape, jnp.uint8)
        keep = bits >= jnp.uint8(thresh)
        # scale from the INTEGER threshold so the estimator stays unbiased
        # for the actual drop rate (thresh/256, within 1/512 of `rate`)
        scale = jnp.asarray(256.0 / (256 - thresh), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros_like(x))
