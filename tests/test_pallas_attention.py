"""Pallas fused attention == XLA reference path (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from applecider_tpu.ops.attention import pallas_masked_attention


def _xla_attention(q, k, v, mask):
    hd = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / np.sqrt(hd)
    if mask is not None:
        scores = jnp.where(mask[:, None, None, :], -1e9, scores)
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def test_pallas_attention_matches_xla(rng):
    B, H, L, hd = 2, 4, 32, 16
    q = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    lengths = rng.integers(8, L + 1, size=B)
    mask = jnp.asarray(np.arange(L)[None, :] >= lengths[:, None])

    ref = _xla_attention(q, k, v, mask)
    out = pallas_masked_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_attention_no_mask(rng):
    B, H, L, hd = 1, 2, 16, 8
    q = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32))
    ref = _xla_attention(q, k, v, None)
    out = pallas_masked_attention(q, k, v, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_encoder_layer_with_pallas_impl(rng):
    """MultiHeadSelfAttention(impl='pallas_interpret') == default XLA impl."""
    from applecider_tpu.models.layers import MultiHeadSelfAttention

    x = jnp.asarray(rng.normal(size=(2, 20, 32)).astype(np.float32))
    mask = jnp.zeros((2, 20), bool)
    m_xla = MultiHeadSelfAttention(4, 0.0, dtype=jnp.float32)
    params = m_xla.init(jax.random.PRNGKey(0), x, mask)["params"]
    ref = m_xla.apply({"params": params}, x, mask)
    m_pl = MultiHeadSelfAttention(4, 0.0, dtype=jnp.float32, impl="pallas_interpret")
    out = m_pl.apply({"params": params}, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_attention_impl_config_plumbing(rng):
    """model.BaselineCLS.attention_impl reaches the encoder: the
    pallas_interpret task produces the same logits as the default."""
    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.baseline_cls import BaselineCLSTask

    x = rng.normal(size=(2, 24, 7)).astype(np.float32)
    pad = np.zeros((2, 24), bool)
    pad[:, 16:] = True

    def logits(impl):
        cfg = load_defaults()
        cfg.set("model.BaselineCLS.d_model", 16)
        cfg.set("model.BaselineCLS.n_heads", 2)
        cfg.set("model.BaselineCLS.n_layers", 1)
        cfg.set("model.BaselineCLS.dropout", 0.0)
        cfg.set("model.BaselineCLS.attention_impl", impl)
        cfg.set("train.compute_dtype", "float32")
        task = BaselineCLSTask(cfg)
        batch = (x, pad, np.zeros(2, np.int64))
        params = task.init(jax.random.PRNGKey(0), batch)["params"]
        return np.asarray(task.predict(params, batch))

    np.testing.assert_allclose(logits("pallas_interpret"), logits("xla"), atol=1e-5)
