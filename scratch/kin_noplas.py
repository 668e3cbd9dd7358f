import sys; sys.path.insert(0, "/root/repo")
import time
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube, QPOS_HOME
sys.path.insert(0, "/root/repo/scratch")
from kin_surgery import V_bodies_scalar, pm  # reuse the exact same function

B, T = 384, 100
qp0 = jnp.asarray(np.tile(np.asarray(QPOS_HOME, np.float32), (B, 1)).T)

def loop(qp):
    def body(c, _):
        acc = V_bodies_scalar(c)
        return c + 1e-12 * acc[None], None
    return jax.lax.scan(body, qp, None, length=T)[0]

run = jax.jit(loop)
t0 = time.time(); jax.block_until_ready(run(qp0)); comp = time.time() - t0
ts = []
for _ in range(15):
    t0 = time.perf_counter(); jax.block_until_ready(run(qp0)); ts.append(time.perf_counter() - t0)
print(f"plain-XLA bodies loop: {np.median(ts)*1e6/T:8.1f} us/step  compile {comp:.1f}s", flush=True)
