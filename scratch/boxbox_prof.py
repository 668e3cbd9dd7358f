import sys, time; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from judo_tpu.physics.box_collision import box_box, capsule_box

R, P, ITER = 320, 15, 100
rng = np.random.default_rng(0)
dtype = jnp.float32
pos1 = jnp.asarray(rng.standard_normal((R, P, 3))*0.02, dtype)
pos2 = pos1 + jnp.asarray(rng.standard_normal((R, P, 3))*0.03, dtype)
def rand_rot(n):
    q = rng.standard_normal((n, 4)); q /= np.linalg.norm(q, axis=1, keepdims=True)
    w,x,y,z = q.T
    return np.stack([1-2*(y*y+z*z),2*(x*y-w*z),2*(x*z+w*y),2*(x*y+w*z),1-2*(x*x+z*z),2*(y*z-w*x),2*(x*z-w*y),2*(y*z+w*x),1-2*(x*x+y*y)],1).reshape(n,3,3)
m1 = jnp.asarray(rand_rot(R*P).reshape(R,P,3,3), dtype)
m2 = jnp.asarray(rand_rot(R*P).reshape(R,P,3,3), dtype)
s1 = jnp.full((R,P,3), 0.035, dtype)
s2 = jnp.full((R,P,3), 0.02, dtype)

bb = jax.vmap(jax.vmap(box_box))
def loop(p1):
    def body(c, _):
        out = bb(c, m1, s1, pos2, m2, s2)
        return c + out.dist[..., :1]*1e-12, 0.0
    return jax.lax.scan(body, p1, None, length=ITER)[0]
f = jax.jit(loop)
t0=time.time(); o=f(pos1); jax.block_until_ready(o); print(f"box_box x{ITER}: compile {time.time()-t0:.1f}s", flush=True)
ts=[]
for _ in range(5):
    t0=time.time(); o=f(pos1); jax.block_until_ready(o); ts.append(time.time()-t0)
print(f"box_box per-iter (15 pairs, R=320): {np.median(ts)/ITER*1e3:.3f} ms", flush=True)
