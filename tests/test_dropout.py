"""FastDropout (ops/dropout.py): torch-semantics checks.

The reference trains with torch.nn.Dropout (p=0.4 transformer, 0.5/0.3
SpectraNet head — src/applecider/default_config.toml:60-64,
_archive/AppleCider/models/SpectraNet.py). FastDropout replaces the f32
uniform draw with an 8-bit integer threshold (drop prob quantized to
1/256); these tests pin the contract:
identity in eval, inverted scaling of kept values, drop rate within
binomial noise of p, masked gradients, and iid masks across calls/sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from applecider_tpu.ops.dropout import FastDropout


def _apply(rate, x, seed=0, deterministic=False):
    mod = FastDropout(rate)
    return mod.apply(
        {}, x, deterministic=deterministic,
        rngs={"dropout": jax.random.PRNGKey(seed)},
    )


def test_eval_is_identity():
    x = jnp.arange(24.0).reshape(4, 6)
    y = _apply(0.4, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y0 = _apply(0.0, x, deterministic=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))


def test_kept_values_are_scaled_exactly():
    p = 0.4
    thresh = round(p * 256)
    x = jnp.ones((512, 512), jnp.float32)
    y = np.asarray(_apply(p, x))
    kept = y[y != 0.0]
    # inverted scale derives from the integer threshold (unbiased for the
    # realized drop rate thresh/256)
    np.testing.assert_allclose(kept, 256.0 / (256 - thresh), rtol=1e-6)


@pytest.mark.parametrize("p", [0.1, 0.3, 0.4, 0.5])
def test_drop_rate_matches_p(p):
    n = 1 << 20
    x = jnp.ones((n,), jnp.float32)
    y = np.asarray(_apply(p, x, seed=7))
    frac = float((y == 0.0).mean())
    # realized drop probability is the 8-bit-quantized threshold
    p_q = round(p * 256) / 256.0
    # 6-sigma binomial bound on 2^20 samples
    sigma = (p_q * (1 - p_q) / n) ** 0.5
    assert abs(frac - p_q) < 6 * sigma


def test_gradient_is_the_same_mask():
    p = 0.4
    x = jnp.ones((256, 64), jnp.float32)

    def f(x):
        return _apply(p, x, seed=3).sum()

    g = np.asarray(jax.grad(f)(x))
    y = np.asarray(_apply(p, x, seed=3))
    np.testing.assert_allclose(g, y, rtol=1e-6)


def test_bf16_stays_bf16():
    x = jnp.ones((8, 8), jnp.bfloat16)
    y = _apply(0.4, x)
    assert y.dtype == jnp.bfloat16


def test_masks_differ_across_sites_and_seeds():
    x = jnp.ones((1 << 12,), jnp.float32)
    a = np.asarray(_apply(0.4, x, seed=0))
    b = np.asarray(_apply(0.4, x, seed=1))
    assert (a != b).any()


def test_full_rate_zeroes():
    x = jnp.ones((16,), jnp.float32)
    y = np.asarray(_apply(1.0, x))
    np.testing.assert_array_equal(y, 0.0)
    # rates that ROUND to 256/256 must not overflow the uint8 threshold
    y999 = np.asarray(_apply(0.999, x))
    np.testing.assert_array_equal(y999, 0.0)


def test_tiny_rate_is_identity():
    # rates below 1/512 quantize to thresh=0: a documented exact no-op
    x = jnp.arange(16.0)
    y = np.asarray(_apply(0.001, x))
    np.testing.assert_array_equal(y, np.asarray(x))


def test_two_sites_draw_independent_masks():
    """Two FastDropout sites under ONE parent module with a shared
    'dropout' rng must produce different (path-folded) masks."""
    from flax import linen as nn

    class TwoSites(nn.Module):
        @nn.compact
        def __call__(self, x):
            a = FastDropout(0.5, name="site_a")(x, deterministic=False)
            b = FastDropout(0.5, name="site_b")(x, deterministic=False)
            return a, b

    x = jnp.ones((1 << 12,), jnp.float32)
    a, b = TwoSites().apply({}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    a, b = np.asarray(a), np.asarray(b)
    assert ((a == 0) != (b == 0)).any(), "sites reused the same mask"
