import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np

x = jnp.ones((128, 128))
f = jax.jit(lambda a: a * 2.0 + 1.0)
jax.block_until_ready(f(x))
ts = []
for _ in range(100):
    t0 = time.perf_counter(); jax.block_until_ready(f(x)); ts.append(time.perf_counter() - t0)
print(f"trivial op p50 {np.median(ts)*1e3:.3f} ms  p5 {np.percentile(ts,5)*1e3:.3f} ms", flush=True)

# chained: 100 sequential trivial ops inside one jit (scan) — device time only
def body(c, _):
    return c * 1.000001 + 1e-6, None
g = jax.jit(lambda a: jax.lax.scan(body, a, None, length=100)[0])
jax.block_until_ready(g(x))
ts = []
for _ in range(50):
    t0 = time.perf_counter(); jax.block_until_ready(g(x)); ts.append(time.perf_counter() - t0)
print(f"scan-100 trivial p50 {np.median(ts)*1e3:.3f} ms", flush=True)
