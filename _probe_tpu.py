import time, numpy as np, jax, jax.numpy as jnp

def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t1 = time.perf_counter()
    # steady state
    for _ in range(3):
        out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    print(f"{name}: compile+first={t1-t0:.1f}s steady={(t2-t1)/3*1e3:.1f}ms", flush=True)

from applecider_tpu.config import load_defaults
cfg = load_defaults()
B = 256
rng = np.random.default_rng(0)

# 1. BaselineCLS
from applecider_tpu.models.baseline_cls import BaselineCLSTask
t = BaselineCLSTask(cfg)
x = rng.normal(size=(B,257,7)).astype(np.float32); pad = np.zeros((B,257),bool)
v = t.init(jax.random.PRNGKey(0), (x,pad,np.zeros(B,np.int64)))
timed("baseline_cls", lambda p,x,m: t.module.apply({"params":p},x,m,deterministic=True), v["params"], x, pad)

# 2. ConvNeXt tiny
from applecider_tpu.models.convnext import convnext_tiny
m = convnext_tiny(dtype=jnp.bfloat16)
img = rng.normal(size=(B,63,63,3)).astype(np.float32)
p = m.init(jax.random.PRNGKey(0), img[:1])["params"]
timed("convnext_tiny", lambda p,x: m.apply({"params":p},x), p, img)

# 3. SpectraNet direct vs fft
from applecider_tpu.models.spectranet import SpectraNetModule
spec = rng.normal(size=(B,3481)).astype(np.float32)
for mode in ["fft","direct"]:
    sm = SpectraNetModule(conv_mode=mode, dtype=jnp.bfloat16)
    sp = sm.init(jax.random.PRNGKey(0), spec[:1], deterministic=True)["params"]
    timed(f"spectranet_{mode}", lambda p,x: sm.apply({"params":p},x,deterministic=True), sp, spec)
