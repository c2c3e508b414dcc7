"""bf16 training must trace end-to-end through every conv family.

Round-3 regression: ``preferred_element_type=f32`` with bf16 conv operands
breaks the conv VJP (``lax.conv_general_dilated`` rejects the mixed
bf16-operand/f32-cotangent transpose conv that grad builds), which made
bf16 *training* of any conv-bearing model untraceable while bf16
inference worked fine. Caught by scripts/tpu_train_probe.py on chip.
"""

import jax
import numpy as np
import optax

from __graft_entry__ import _fusion_batch, _fusion_task


def test_bf16_fusion_train_step_traces_and_is_finite():
    task = _fusion_task(tiny=True, compute_dtype="bfloat16")
    batch = _fusion_batch(4, tiny=True)
    params = task.init(jax.random.PRNGKey(0), batch)["params"]
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, rng):
        (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
            params, batch, rng, True
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # a second step exercises the updated params through the same trace
    _, _, loss2 = train_step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss2))


def test_bf16_s2d_conv_grad_traces():
    import jax.numpy as jnp

    from applecider_tpu.ops.conv1d import conv1d_s2d

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 1)), jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(13, 1, 8)), jnp.float32)

    def loss(w):
        return jnp.sum(conv1d_s2d(x, w).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g, np.float32)))


def test_layernorm_custom_vjp_matches_autodiff():
    """The memory-lean LN custom VJP (saves x/mean/inv, recomputes xhat in
    the backward) must produce the same forward and the same grads as plain
    autodiff through the same math — tight in f32, bf16-tolerance in bf16."""
    import jax.numpy as jnp

    from applecider_tpu.models import layers

    rng = np.random.default_rng(11)
    for dtype, atol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        x = jnp.asarray(rng.normal(size=(4, 33, 192)).astype(np.float32),
                        dtype=dtype)
        scale = jnp.asarray(rng.normal(1.0, 0.1, 192).astype(np.float32))
        bias = jnp.asarray(rng.normal(0.0, 0.1, 192).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(4, 33, 192)).astype(np.float32))

        def loss_vjp(x, s, b):
            return jnp.sum(layers._ln_apply(x, s, b, 1e-5) * g)

        def loss_ad(x, s, b):
            return jnp.sum(layers._ln_norm(x, s, b, 1e-5)[0] * g)

        y_vjp = layers._ln_apply(x, scale, bias, 1e-5)
        y_ad = layers._ln_norm(x, scale, bias, 1e-5)[0]
        np.testing.assert_allclose(np.asarray(y_vjp), np.asarray(y_ad),
                                   atol=1e-6)
        gv = jax.grad(loss_vjp, argnums=(0, 1, 2))(x, scale, bias)
        ga = jax.grad(loss_ad, argnums=(0, 1, 2))(x, scale, bias)
        for a, b, name in zip(gv, ga, ("dx", "dscale", "dbias")):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=atol, rtol=1e-4, err_msg=f"{name} ({dtype})")
