import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from judo_tpu.physics.box_collision import box_box, capsule_box
from judo_tpu.physics import lane_collision as lc
from judo_tpu.ops.math import quat_to_mat

rng = np.random.default_rng(7)
B = 64
# random oriented box pairs: mixture of separated/touching/penetrating
p1 = 0.1*rng.standard_normal((B,3)); p2 = p1 + 0.15*rng.standard_normal((B,3))
def rq(n):
    q = rng.standard_normal((n,4)); return q/np.linalg.norm(q,axis=1,keepdims=True)
m1 = np.asarray(quat_to_mat(jnp.asarray(rq(B)))); m2 = np.asarray(quat_to_mat(jnp.asarray(rq(B))))
s1 = 0.05 + 0.1*rng.random((B,3)); s2 = 0.05 + 0.1*rng.random((B,3))

ref = jax.jit(jax.vmap(box_box))(*map(jnp.asarray,(p1,m1,s1,p2,m2,s2)))

# lanes: sizes must be per-pair host constants -> loop pairs one at a time with B=1... 
# instead check pairwise with shared size via grouping: do per-sample with B=1 lanes
errs_d, errs_p = [], []
import collections
for i in range(B):
    out = jax.jit(lambda a,b,c,d: lc._k_box_box(a, b, s1[i], c, d, s2[i]))(
        jnp.asarray(p1[i][:,None]), jnp.asarray(m1[i][:,:,None]),
        jnp.asarray(p2[i][:,None]), jnp.asarray(m2[i][:,:,None]))
    ld = np.array([np.asarray(o[0])[0] for o in out])
    lp = np.array([np.asarray(o[1])[:,0] for o in out])
    ln = np.array([np.asarray(o[2])[:,0] for o in out])
    rd = np.asarray(ref.dist[i]); rp = np.asarray(ref.pos[i]); rn = np.asarray(ref.normal[i])
    act = rd < 1e9
    errs_d.append(np.abs(ld-rd)[act].max() if act.any() else 0)
    errs_p.append((np.abs(lp-rp)[act].max() if act.any() else 0))
print("dist maxerr", max(errs_d), "pos maxerr", max(errs_p), flush=True)
print("OK" if max(errs_d) < 1e-10 and max(errs_p) < 1e-10 else "FAIL")

# capsule-box
p1 = 0.05*rng.standard_normal((B,3)); p2 = p1 + 0.12*rng.standard_normal((B,3))
m1 = np.asarray(quat_to_mat(jnp.asarray(rq(B)))); m2 = np.asarray(quat_to_mat(jnp.asarray(rq(B))))
s1 = np.concatenate([0.02+0.03*rng.random((B,1)), 0.05+0.1*rng.random((B,1)), np.zeros((B,1))],axis=1)
s2 = 0.05 + 0.1*rng.random((B,3))
ref = jax.jit(jax.vmap(capsule_box))(*map(jnp.asarray,(p1,m1,s1,p2,m2,s2)))
ed, ep = 0, 0
for i in range(B):
    out = jax.jit(lambda a,b,c,d: lc._k_capsule_box(a, b, s1[i], c, d, s2[i]))(
        jnp.asarray(p1[i][:,None]), jnp.asarray(m1[i][:,:,None]),
        jnp.asarray(p2[i][:,None]), jnp.asarray(m2[i][:,:,None]))
    ld = np.array([np.asarray(o[0])[0] for o in out]); lp = np.array([np.asarray(o[1])[:,0] for o in out])
    rd = np.asarray(ref.dist[i]); rp = np.asarray(ref.pos[i])
    ed = max(ed, np.abs(ld-rd).max()); ep = max(ep, np.abs(lp-rp).max())
print("capsule_box dist maxerr", ed, "pos maxerr", ep, "OK" if ed<1e-10 and ep<1e-10 else "FAIL")
