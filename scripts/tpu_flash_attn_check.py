"""On-chip validation + train-step A/B for the fused flash attention kernel.

Three phases, honest relay sync throughout (see .claude/skills/verify):

1. PRNG-path correctness: run ``flash_attention_export_mask`` (the TPU-core
   PRNG generates the dropout bits in-kernel and also writes the keep mask
   out), then replay that exact keep decision through (a) the injected-bits
   Pallas kernel and (b) a pure-JAX oracle; all three must agree.  Also
   checks the realized keep rate against 1 - round(rate*256)/256.
2. Backward bit-replay: grads through the PRNG path (which RE-generates the
   bits in the backward kernel) must equal grads through the bits path fed
   the exported mask — proves fwd and bwd see identical bits.
3. Train-step A/B at the production shape: full fusion train step
   (loss+grad+adam, bf16, rbg dropout) with attention_impl xla vs flash,
   b256/b1024, unchained relay timing (tpu_train_probe.py conventions).

Run: nohup python -u scripts/tpu_flash_attn_check.py > /tmp/flash_check.log 2>&1 &
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "tpu_results", "flash_attn_check_r3.jsonl")
rows = []


def emit(**kw):
    rows.append(kw)
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    dev = jax.devices()[0]
    emit(device=str(dev))

    from applecider_tpu.ops.flash_attention import (
        _drop_consts,
        flash_attention,
        flash_attention_export_mask,
        flash_attention_with_bits,
    )

    # ---------------- phase 1: PRNG path vs exported-mask replays
    B, H, L, hd, rate = 8, 8, 257, 16, 0.25
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32), dtype=jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32), dtype=jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32), dtype=jnp.bfloat16)
    lengths = rng.integers(L // 3, L + 1, size=B)
    pad_np = np.arange(L)[None, :] >= lengths[:, None]
    pad = jnp.asarray(pad_np)
    mask_i32 = pad.astype(jnp.int32).reshape(B, 1, L)
    seed = jnp.asarray([12345], jnp.int32)
    thresh, drop_scale = _drop_consts(rate)

    out_prng, keep_u8 = jax.jit(
        flash_attention_export_mask, static_argnums=(5,)
    )(q, k, v, pad, seed, rate)
    out_prng_np = np.asarray(out_prng).astype(np.float32)  # fetch BEFORE timing
    keep_np = np.asarray(keep_u8)

    # realized keep rate over valid keys only
    valid_cols = ~pad_np  # (B, L)
    keep_valid = keep_np[:, :, :, :][..., :]  # (B,H,L,L)
    sel = np.broadcast_to(valid_cols[:, None, None, :], keep_valid.shape)
    realized = float(keep_valid[sel].mean())
    expect = 1.0 - thresh / 256.0
    emit(check="keep_rate", realized=round(realized, 5), expected=expect,
         ok=bool(abs(realized - expect) < 0.005))

    bits_replay = jnp.asarray(keep_np * np.uint8(255))
    out_bits = jax.jit(
        flash_attention_with_bits, static_argnums=(5, 6)
    )(q, k, v, mask_i32, bits_replay, rate, False)
    out_bits_np = np.asarray(out_bits).astype(np.float32)
    d_kernel = float(np.max(np.abs(out_prng_np - out_bits_np)))
    emit(check="prng_vs_bits_replay_max_abs", value=d_kernel, ok=bool(d_kernel == 0.0))

    # pure-JAX oracle (bf16 probs matmul like the kernel)
    @jax.jit
    def oracle(q, k, v):
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32),
            preferred_element_type=jnp.float32) / math.sqrt(hd)
        scores = scores + jnp.where(pad[:, None, None, :], -1e9, 0.0)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p_un = jnp.exp(scores - m)
        denom = jnp.sum(p_un, axis=-1, keepdims=True)
        kept = jnp.where(keep_u8 > 0, p_un * jnp.float32(drop_scale), 0.0)
        pv = jnp.einsum("bhqk,bhkd->bhqd", kept.astype(jnp.bfloat16), v,
                        preferred_element_type=jnp.float32)
        return (pv / denom).astype(jnp.bfloat16)

    out_oracle = np.asarray(oracle(q, k, v)).astype(np.float32)
    row_valid = ~pad_np  # (B, L) query rows that are real
    sel_rows = np.broadcast_to(
        row_valid[:, None, :, None], out_prng_np.shape)
    d_oracle = float(np.max(np.abs((out_prng_np - out_oracle)[sel_rows])))
    emit(check="prng_vs_jax_oracle_max_abs_valid_rows", value=d_oracle,
         ok=bool(d_oracle < 0.05))  # bf16 PV reduction-order tolerance

    # ---------------- phase 2: backward regenerates identical bits
    g_out = jnp.asarray(rng.normal(size=(B, H, L, hd)).astype(np.float32),
                        dtype=jnp.bfloat16)

    def loss_prng(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask_i32, seed, rate)
                       .astype(jnp.float32) * g_out.astype(jnp.float32))

    def loss_bits(q, k, v):
        return jnp.sum(
            flash_attention_with_bits(q, k, v, mask_i32, bits_replay, rate, False)
            .astype(jnp.float32) * g_out.astype(jnp.float32))

    gp = jax.jit(jax.grad(loss_prng, argnums=(0, 1, 2)))(q, k, v)
    gb = jax.jit(jax.grad(loss_bits, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gp, gb):
        a = np.asarray(a).astype(np.float32)
        b = np.asarray(b).astype(np.float32)
        d = float(np.max(np.abs(a - b)))
        emit(check=f"bwd_bit_replay_d{name}_max_abs", value=d, ok=bool(d == 0.0))

    # ---------------- phase 2.5: SPMD rule smoke on a 1-device TPU mesh
    # (the rig has one chip, so this validates that the custom_partitioning
    # wrapper lowers + runs the PRNG kernels on TPU and is bit-identical to
    # the direct path; the >1-shard slicing logic is CPU-mesh-tested in
    # tests/test_flash_attention.py through the injected-bits twin)
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from applecider_tpu.ops.flash_attention import _sharded_prng

    scale = 1.0 / math.sqrt(hd)
    mesh1 = Mesh(np.array([dev]).reshape(1), ("data",))
    sh4 = NamedSharding(mesh1, P("data", None, None, None))
    sh3 = NamedSharding(mesh1, P("data", None, None))
    sh1 = NamedSharding(mesh1, P(None))
    qm, km, vm, gm = (jax.device_put(t, sh4) for t in (q, k, v, g_out))
    mm = jax.device_put(mask_i32, sh3)
    sm = jax.device_put(seed, sh1)
    out_mesh = jax.jit(_sharded_prng("fwd", scale, thresh, drop_scale))(
        qm, km, vm, mm, sm)
    d_mesh = float(np.max(np.abs(
        np.asarray(out_mesh).astype(np.float32) - out_prng_np)))
    emit(check="spmd_fwd_1dev_mesh_vs_direct_max_abs", value=d_mesh,
         ok=bool(d_mesh == 0.0))
    gmesh = jax.jit(_sharded_prng("bwd", scale, thresh, drop_scale))(
        qm, km, vm, mm, sm, gm)
    for name, a, b in zip("qkv", gmesh, gp):
        d = float(np.max(np.abs(np.asarray(a).astype(np.float32)
                                - np.asarray(b).astype(np.float32))))
        emit(check=f"spmd_bwd_1dev_mesh_d{name}_max_abs", value=d,
             ok=bool(d == 0.0))

    # ---------------- phase 3: full fusion train step A/B
    import optax
    from __graft_entry__ import _fusion_batch
    from applecider_tpu.config import load_defaults
    from applecider_tpu.models.fusion import AppleCiderTask
    from applecider_tpu.train.optim import with_grad_clip

    def make_task(impl):
        cfg = load_defaults()
        cfg.set("train.compute_dtype", "bfloat16")
        cfg.set("model.BaselineCLS.attention_impl", impl)
        return AppleCiderTask(cfg)

    rng_key = jax.random.key(1, impl="rbg")
    losses = {}
    for impl in ("xla", "flash"):
        task = make_task(impl)
        params = jax.device_put(
            task.init(jax.random.PRNGKey(0), _fusion_batch(batch_size=8))["params"],
            dev)
        tx = with_grad_clip(task.make_optimizer(), task.grad_clip)
        opt_state = tx.init(params)

        @jax.jit
        def train_step(params, opt_state, batch, rng, task=task, tx=tx):
            (loss, aux), grads = jax.value_and_grad(task.loss_fn, has_aux=True)(
                params, batch, rng, True)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        for bs in (256, 1024):
            batch = tuple(jax.device_put(np.asarray(x), dev)
                          for x in _fusion_batch(bs))
            p, o, loss = train_step(params, opt_state, batch, rng_key)
            loss0 = float(np.asarray(loss))  # compile + sync
            losses[(impl, bs)] = loss0
            N = 8
            t0 = time.perf_counter()
            for _ in range(N):
                _p, _o, loss = train_step(params, opt_state, batch, rng_key)
            _ = float(np.asarray(loss))
            dt = (time.perf_counter() - t0) / N
            emit(stage="train_step", impl=impl, batch=bs,
                 ms=round(dt * 1e3, 1),
                 alerts_per_sec_training=round(bs / dt, 1),
                 loss=round(loss0, 6),
                 loss_finite=bool(np.isfinite(loss0)))

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows) + "\n")
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
