"""Shared flax layers with torch-equivalent numerics.

The reference stacks torch built-ins (``nn.TransformerEncoder``,
``nn.MultiheadAttention``, ``nn.LayerNorm``, ``nn.Conv1d``); the BASELINE
target requires our logits to match a torch forward pass to 1e-4, so these
layers reproduce torch's exact math (post-LN encoder blocks, ReLU FFN,
eps=1e-5 LayerNorm, q-scaled attention with additive key-padding masks)
while staying fully static-shaped for XLA.

Initializers follow torch defaults (kaiming-uniform weights, fan-in uniform
bias) so training dynamics are comparable even without ported weights.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from applecider_tpu.ops.dropout import FastDropout
from jax.ad_checkpoint import checkpoint_name


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear weight default: kaiming_uniform(a=sqrt(5)).

    For a flax kernel of shape (fan_in, fan_out) this reduces to
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Linear(nn.Module):
    """nn.Dense with torch-default initialization."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (fan_in, self.features))
        bias = (self.param("bias", torch_bias_init(fan_in), (self.features,))
                if self.use_bias else None)
        # opt-in int8 serving path (ops/quant.py): a trace-time no-op unless
        # a quantized()/observing() context is active
        from applecider_tpu.ops.quant import quant_dense

        q = quant_dense(x, kernel, bias, self.path, self.dtype or x.dtype)
        if q is not None:
            return q
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y


# LayerNorm autodiff saves f32 (B, L, C) residuals for the backward — on
# the b256 train step the post-flash-attention trace attributes ~30 ms/step
# to f32[256,3481,192]/[256,870,*] LN-chain fusions in SpectraNet's early
# stages.  The custom VJP below saves only (x in its own dtype, mean, inv)
# and recomputes xhat inside the backward fusion, so nothing f32 and
# (B, L, C)-sized survives the forward.  Math is the standard exact LN
# backward; unit-tested against autodiff (tests/test_bf16_training.py).
# ``ACLN=autodiff`` reverts to plain autodiff (A/B knob, read at trace time).
_LN_IMPL = None  # None = read env; A/B scripts set layers._LN_IMPL directly


def _ln_impl() -> str:
    if _LN_IMPL is not None:
        return _LN_IMPL
    import os

    return os.environ.get("ACLN", "vjp")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_apply(x, scale, bias, eps):
    y, _ = _ln_fwd_res(x, scale, bias, eps)
    return y


def _ln_norm(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return (xf - mean) * inv * scale + bias, mean, inv


def _ln_fwd_res(x, scale, bias, eps):
    y, mean, inv = _ln_norm(x, scale, bias, eps)
    return y, (x, mean, inv, scale)


def _ln_bwd(eps, res, g):
    x, mean, inv, scale = res
    xhat = (x.astype(jnp.float32) - mean) * inv  # recomputed, fuses into bwd
    g = g.astype(jnp.float32)
    red = tuple(range(g.ndim - 1))
    dscale = jnp.sum(g * xhat, axis=red)
    dbias = jnp.sum(g, axis=red)
    gs = g * scale
    m1 = jnp.mean(gs, axis=-1, keepdims=True)
    m2 = jnp.mean(gs * xhat, axis=-1, keepdims=True)
    dx = (inv * (gs - m1 - xhat * m2)).astype(x.dtype)
    return dx, dscale, dbias


_ln_apply.defvjp(_ln_fwd_res, _ln_bwd)


class LayerNorm(nn.Module):
    """torch LayerNorm over the last dim (default eps 1e-5), computed in f32."""

    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        if _ln_impl() == "vjp":
            y = _ln_apply(x, scale, bias, self.eps)
        else:  # plain autodiff (identical forward math)
            y, _, _ = _ln_norm(x, scale, bias, self.eps)
        return y.astype(self.dtype or orig_dtype)


class LayerNormGelu(nn.Module):
    """LayerNorm + exact GELU with LayerNorm-identical params ("scale"/
    "bias" — checkpoint-compatible drop-in for a LayerNorm followed by
    ``gelu_exact``).

    Default path is EXACTLY the legacy two-op sequence (f32 LN stats, cast
    to the input dtype, gelu in that dtype) so parity tests are unchanged.
    ``ACLNGELU=pallas`` routes through the fused single-pass Pallas kernel
    (ops/ln_gelu.py; gelu computed in f32 before the cast — identical in
    f32 mode, last-bit different in bf16); see KERNEL_NOTES for the
    on-chip A/B that gates adoption.
    """

    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        from applecider_tpu.ops.ln_gelu import impl as _lg_impl, ln_gelu

        orig_dtype = x.dtype
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        mode = _lg_impl()
        if mode.startswith("pallas"):
            y = ln_gelu(x, scale, bias, self.eps, impl_override=mode)
            return y.astype(self.dtype or orig_dtype)
        if _ln_impl() == "vjp":
            y = _ln_apply(x, scale, bias, self.eps)
        else:
            y, _, _ = _ln_norm(x, scale, bias, self.eps)
        return gelu_exact(y.astype(self.dtype or orig_dtype))


class MultiHeadSelfAttention(nn.Module):
    """torch nn.MultiheadAttention semantics (fused qkv, q-scaling, key padding).

    ``key_padding_mask``: (B, L) boolean, True = padded. Masked keys receive a
    large negative additive bias instead of -inf so fully-padded rows stay
    finite (their outputs are discarded downstream anyway).
    """

    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    impl: str = "auto"  # "auto" | "xla" | "pallas" | "pallas_interpret" | "flash"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, *, deterministic: bool = True):
        B, L, D = x.shape
        H = self.num_heads
        head_dim = D // H
        qkv = Linear(3 * D, dtype=self.dtype, name="in_proj")(x)  # (B, L, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, L, H, head_dim).transpose(0, 2, 1, 3)  # (B,H,L,hd)

        q, k, v = heads(q), heads(k), heads(v)
        # "auto" resolves at trace time: the fused flash train kernel on a
        # TPU backend (on-chip A/B: b256 train step 122.2 -> 110.8 ms,
        # b1024 685.7 -> 467.6 ms — tpu_results/flash_attn_check_r3.jsonl),
        # XLA everywhere else.  Under a mesh the kernel carries a Shardy
        # custom_partitioning rule (ops/flash_attention._sharded_prng):
        # batch-dim passthrough, per-shard seed decorrelation, no
        # collectives — each device runs the kernel on its local batch
        # shard.  L must fit a full (L, L) f32 tile in VMEM (<= 258).
        impl = self.impl
        if impl == "auto":
            flash_ok = jax.default_backend() == "tpu" and L <= 258
            impl = "flash" if flash_ok else "xla"
        # "flash": fused Pallas attention+dropout for TRAIN steps — the
        # (B, H, L, L) probs and the u8 dropout mask never touch HBM (the
        # mask bits come from the TPU-core PRNG, regenerated in the
        # backward). Eval/serving calls fall through to the XLA path below.
        use_flash = (
            impl == "flash" and not deterministic and self.dropout > 0.0
        )
        use_pallas = impl.startswith("pallas") and (deterministic or self.dropout == 0.0)
        if use_flash:
            from applecider_tpu.ops.flash_attention import flash_attention_train

            seed = jax.random.randint(
                self.make_rng("dropout"), (1,), 0,
                jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
            )
            out = flash_attention_train(
                q, k, v, key_padding_mask, seed, self.dropout
            )
        elif use_pallas:
            from applecider_tpu.ops.attention import pallas_masked_attention

            out = pallas_masked_attention(
                q, k, v, key_padding_mask, interpret=self.impl == "pallas_interpret"
            )
        else:
            # bf16 compute: materialize the (B, H, L, L) score tensor in
            # bf16 — it's the transformer's HBM bottleneck on TPU (545 MB
            # f32 per layer at B=256; softmax makes 2-3 passes over it).
            # MXU accumulation stays f32 either way; f32 mode keeps the
            # full-precision chain for the 1e-4 torch-parity path.
            score_dtype = q.dtype  # bf16 scores in bf16 mode, f32 in f32 mode
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            scores = (scores / math.sqrt(head_dim)).astype(score_dtype)
            if key_padding_mask is not None:
                neg = jnp.asarray(-1e9, dtype=score_dtype)  # exactly representable in bf16
                scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
            # checkpoint_name tags let the remat="attn" policy (layers.py
            # TransformerEncoder) recompute ONLY these (B, H, L, L) tensors
            # in the backward; outside a remat they are identity no-ops
            scores = checkpoint_name(scores, "attn_scores")
            attn = checkpoint_name(
                jax.nn.softmax(scores, axis=-1).astype(q.dtype), "attn_probs")
            attn = checkpoint_name(
                FastDropout(self.dropout)(attn, deterministic=deterministic),
                "attn_drop")
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return Linear(D, dtype=self.dtype, name="out_proj")(out)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder block: torch nn.TransformerEncoderLayer defaults.

    x = LN1(x + Drop(SelfAttn(x))); x = LN2(x + Drop(W2 Drop(act(W1 x)))).
    Activation is ReLU (torch default used by the reference encoders).
    """

    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    activation: Callable = nn.relu
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic: bool = True):
        D = x.shape[-1]
        attn_out = MultiHeadSelfAttention(
            self.num_heads, self.dropout, dtype=self.dtype, impl=self.attn_impl,
            name="self_attn",
        )(x, key_padding_mask, deterministic=deterministic)
        attn_out = FastDropout(self.dropout)(attn_out, deterministic=deterministic)
        x = LayerNorm(dtype=self.dtype, name="norm1")(x + attn_out)
        h = Linear(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = self.activation(h)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        h = Linear(D, dtype=self.dtype, name="linear2")(h)
        h = FastDropout(self.dropout)(h, deterministic=deterministic)
        return LayerNorm(dtype=self.dtype, name="norm2")(x + h)


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (torch nn.TransformerEncoder, no final norm).

    ``remat=True`` rematerializes each layer in the backward pass
    (``nn.remat``): the (B, H, L, L) attention scores / probs / dropout
    masks are recomputed instead of being saved from the forward — trades
    a second forward's FLOPs for the HBM footprint of ~0.7 GB per layer
    at the production (B=256, 8h, L=258) shape. Numerically identical
    (the lifted remat replays the same dropout RNG). No effect on
    grad-free inference. Measured SLOWER on a single v5e chip at
    b256/b512 where everything fits in HBM (KERNEL_NOTES: remat A/B) —
    it is a memory knob for batch/sequence shapes that would otherwise
    OOM, not a speed knob.
    """

    num_layers: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    attn_impl: str = "auto"
    remat: object = False  # False | True (full layer) | "attn" (selective)

    @nn.compact
    def __call__(self, x, key_padding_mask=None, *, deterministic: bool = True):
        layer_cls = TransformerEncoderLayer
        if self.remat == "attn":
            # selective remat: save every intermediate EXCEPT the
            # (B, H, L, L) score/prob/dropout tensors (tagged with
            # checkpoint_name in MultiHeadSelfAttention) — the backward
            # recomputes them from the saved qkv with one extra einsum +
            # softmax + RNG replay instead of round-tripping ~3x273 MB
            # per layer (b256 bf16) through HBM. Full-layer remat also
            # recomputes the MLP matmuls, which the on-chip A/B measured
            # as a 31% loss; this mode targets only the memory-bound part.
            policy = jax.checkpoint_policies.save_anything_except_these_names(
                "attn_scores", "attn_probs", "attn_drop")
            layer_cls = nn.remat(
                TransformerEncoderLayer, static_argnums=(3,), policy=policy)
        elif self.remat:
            # deterministic (arg 3; self is 0) is a python bool -> static
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.num_heads,
                self.dim_feedforward,
                self.dropout,
                dtype=self.dtype,
                attn_impl=self.attn_impl,
                name=f"layer_{i}",
            )(x, key_padding_mask, deterministic)
        return x


def resolve_remat(value):
    """Resolve a ``model.*.remat`` config value to False | True | "attn".

    ``"auto"`` (the default) resolves to False on every backend: the
    on-chip A/B (tpu_results/remat_ab_r3.jsonl; KERNEL_NOTES: remat A/B)
    measured the rematerialized b256 fusion train step 31% slower than
    the plain path (179.6 vs 136.6 ms; b512 364.6 vs 289.1 ms) — the
    saved activations fit in v5e HBM at production shapes, so remat only
    pays recompute FLOPs. Set ``remat = true`` explicitly for shapes
    that OOM (e.g. b>=2048 or long sequences), where trading ~0.7
    GB/layer for a second forward is the only way to fit.
    """
    if isinstance(value, bool):
        return value
    v = str(value).strip().lower()
    if v in ("true", "1", "yes", "layer"):
        return True
    if v == "attn":
        return "attn"
    return False


def gelu_exact(x):
    """torch F.gelu default = exact erf formulation (jax default is tanh approx)."""
    return jax.nn.gelu(x, approximate=False)
