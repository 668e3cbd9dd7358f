import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from judo_tpu.physics import lane_engine as le, lane_step as ls

B = 128
dt = jnp.float32

def f1(a):
    return jnp.sum(le.spd_inverse_l(a))
jaxpr = jax.make_jaxpr(f1)(jnp.zeros((22, 22, B), dt))
for eqn in jaxpr.jaxpr.eqns:
    if eqn.primitive.name == "gather":
        print("spd_inverse gather:", [v.aval.shape for v in eqn.invars],
              [f"{f.file_name.split('/')[-1]}:{f.line_num}" for f in eqn.source_info.traceback.frames if "judo_tpu" in f.file_name][:2], flush=True)
        break

def f2(J, minv, reg, b, f):
    return jnp.sum(ls.solve_dual_qp_l(J, minv, reg, b, 5, f))
jaxpr = jax.make_jaxpr(f2)(jnp.zeros((304,22,B),dt), jnp.zeros((22,22,B),dt), jnp.zeros((304,B),dt), jnp.zeros((304,B),dt), jnp.zeros((304,B),dt))
def walk(jx, depth=0):
    for eqn in jx.eqns:
        if eqn.primitive.name == "gather":
            print("apgd gather:", [v.aval.shape for v in eqn.invars],
                  [f"{f.file_name.split('/')[-1]}:{f.line_num}" for f in eqn.source_info.traceback.frames if "judo_tpu" in f.file_name][:2], flush=True)
            return True
        for sub in jax.core.jaxprs_in_params(eqn.params) if hasattr(jax.core, 'jaxprs_in_params') else []:
            pass
    return False
found = walk(jaxpr.jaxpr)
# also check inside fori_loop body jaxprs
for eqn in jaxpr.jaxpr.eqns:
    for k, v in eqn.params.items():
        if hasattr(v, "jaxpr"):
            for e2 in v.jaxpr.eqns:
                if e2.primitive.name == "gather":
                    print("apgd inner gather:", [vv.aval.shape for vv in e2.invars],
                          [f"{f.file_name.split('/')[-1]}:{f.line_num}" for f in e2.source_info.traceback.frames if "judo_tpu" in f.file_name][:2], flush=True)
                    found = True
                    break
print("done", flush=True)
