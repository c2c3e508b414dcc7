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
