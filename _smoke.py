import time, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
t0=time.perf_counter()
x = jnp.ones((1024,1024), jnp.bfloat16)
y = (x @ x).block_until_ready()
print(f"matmul1 {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
f = jax.jit(lambda a: jnp.tanh(a @ a).sum())
print("r:", f(x), f"jit {time.perf_counter()-t0:.1f}s", flush=True)
