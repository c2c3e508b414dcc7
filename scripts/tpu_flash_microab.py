"""Isolate the flash-attention kernel's time between matmul / softmax /
PRNG / dropout-mask components (round 4).

The bf16-matmul change moved the b256 step only 19.5 -> 18.9 ms of
attention time, so the kernel is NOT MXU-bound. This probe times the
forward kernel at the train shape (B=256, H=8, L=258, hd=16) in ablation
ladder: full -> no-PRNG (keep=None) -> no-softmax (scores passthrough)
-> matmuls-only, attributing the per-step cost.

Run: nohup python -u scripts/tpu_flash_microab.py > /tmp/flash_microab.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from applecider_tpu.ops.flash_attention import (  # noqa: E402
    _drop_consts, _fwd_cost, _keep_mask, _mask_spec, _qkv_spec, _seed_pair,
)

B, H, L, hd = 256, 8, 258, 16
G = 8
NEG = -1e9


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                scale, thresh, drop_scale, mode):
    Gb, Hb, Lb = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]

    def body(i, carry):
        g, h = i // Hb, i % Hb
        neg = jnp.where(mask_ref[g] > 0, NEG, 0.0).astype(jnp.float32)
        q = (q_ref[g, h].astype(jnp.float32) * scale).astype(k_ref.dtype)
        scores = jax.lax.dot_general(
            q, k_ref[g, h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + neg
        if mode == "matmul_only":
            p_un = scores
        else:
            m = jnp.max(scores, axis=-1, keepdims=True)
            p_un = jnp.exp(scores - m)
            denom = jnp.sum(p_un, axis=-1, keepdims=True)
        if mode == "full":
            _seed_pair(seed_ref, i, Gb * Hb)
            bits = pltpu.bitcast(pltpu.prng_random_bits((Lb, Lb)), jnp.uint32)
            keep = _keep_mask(bits, thresh)
            p_un = jnp.where(keep, p_un * jnp.float32(drop_scale), 0.0)
        elif mode == "prng_only_no_apply":
            _seed_pair(seed_ref, i, Gb * Hb)
            bits = pltpu.bitcast(pltpu.prng_random_bits((Lb, Lb)), jnp.uint32)
            p_un = p_un + (bits & jnp.uint32(1)).astype(jnp.float32) * 0.0
        pv = jax.lax.dot_general(
            p_un.astype(o_ref.dtype), v_ref[g, h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if mode == "matmul_only":
            o_ref[g, h] = pv.astype(o_ref.dtype)
        else:
            o_ref[g, h] = (pv / denom).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, Gb * Hb, body, 0)


def _fwd_kernel_batched(seed_ref, q_ref, k_ref, v_ref, mask_ref, o_ref, *,
                        scale, thresh, drop_scale, pair_block):
    """All-pairs batched-dot variant: dot_general with a leading batch dim
    over `pair_block` (g,h) pairs per fori step — fewer, larger MXU issues."""
    Gb, Hb, Lb = q_ref.shape[0], q_ref.shape[1], q_ref.shape[2]
    hb = Hb // pair_block  # head-blocks per batch row

    def body(i, carry):
        g, h0 = i // hb, (i % hb) * pair_block
        qb = (q_ref[g, pl.ds(h0, pair_block)].astype(jnp.float32) * scale
              ).astype(k_ref.dtype)
        kb = k_ref[g, pl.ds(h0, pair_block)]
        vb = v_ref[g, pl.ds(h0, pair_block)]
        scores = jax.lax.dot_general(
            qb, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        neg = jnp.where(mask_ref[g] > 0, NEG, 0.0).astype(jnp.float32)
        scores = scores + neg[None]
        m = jnp.max(scores, axis=-1, keepdims=True)
        p_un = jnp.exp(scores - m)
        denom = jnp.sum(p_un, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p_un.astype(o_ref.dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[g, pl.ds(h0, pair_block)] = (pv / denom).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, Gb * hb, body, 0)


def run(mode: str, dev):
    thresh, drop_scale = _drop_consts(0.4)
    scale = 1.0 / np.sqrt(hd)
    if mode.startswith("batched"):
        kern = functools.partial(_fwd_kernel_batched, scale=scale,
                                 thresh=thresh, drop_scale=drop_scale,
                                 pair_block=int(mode.split("batched")[1]))
    else:
        kern = functools.partial(_fwd_kernel, scale=scale, thresh=thresh,
                                 drop_scale=drop_scale, mode=mode)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // G,),
        in_specs=[_qkv_spec(G, H, L, hd)] * 3 + [_mask_spec(G, L)],
        out_specs=_qkv_spec(G, H, L, hd),
    )
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, L, hd), jnp.bfloat16),
        cost_estimate=_fwd_cost(B, H, L, hd),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, L, hd)), jnp.bfloat16)
               for _ in range(3))
    mask = jnp.asarray((rng.random((B, 1, L)) < 0.2), jnp.int32)
    seed = jnp.asarray([7], jnp.int32)
    f = jax.jit(lambda s, a, b, c, m: call(s, a, b, c, m))
    t0 = time.time()
    out = f(seed, q, k, v, mask)
    _ = np.asarray(out[0, 0, 0, 0])
    compile_s = time.time() - t0
    iters = 30
    t0 = time.time()
    for _ in range(iters):
        out = f(seed, q, k, v, mask)
    _ = np.asarray(out[0, 0, 0, 0])
    ms = (time.time() - t0) / iters * 1e3
    print(json.dumps({"mode": mode, "fwd_ms": round(ms, 3),
                      "compile_s": round(compile_s, 1)}), flush=True)
    return ms


def main():
    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "shape": [B, H, L, hd], "G": G}),
          flush=True)
    results = {}
    # two interleaved rounds: the relay's run-to-run variance is ~2x, so
    # only same-run, repeated A/Bs mean anything; keep the min per mode.
    # The batched* modes (pair-batched dot_general) are opt-in via argv:
    # they SIGABRT the Mosaic compile helper on this toolchain (recorded
    # in flash_microab_r4.jsonl / KERNEL_NOTES round-4 section).
    ladder = ["full", "no_prng", "matmul_only"]
    if "--batched" in sys.argv:
        ladder += ["batched4", "batched8"]
    for mode in ladder * 2:
        ms = run(mode, dev)
        results[mode] = min(results.get(mode, 1e9), ms)
    with open("/root/repo/tpu_results/flash_microab_r4.jsonl", "a") as fh:
        fh.write(json.dumps({"device": str(dev), "B": B, "H": H, "L": L,
                             "hd": hd, "G": G,
                             **{k: round(v, 3) for k, v in results.items()}}) + "\n")


if __name__ == "__main__":
    main()
