import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from judo_tpu.tasks.leap_cube import LeapCube
from judo_tpu.physics import lane_engine as le

task = LeapCube()
pm = task.planning_model
B = 128
dt = jnp.float32

def s_com(qp):
    k = le.kinematics_l(pm, qp)
    c = le.com_l(pm, k)
    return sum(jnp.sum(x) for x in c.cinert) + sum(jnp.sum(x) for x in c.cdof) + sum(jnp.sum(x) for x in c.subtree_com)

jaxpr = jax.make_jaxpr(s_com)(jnp.zeros((pm.nq, B), dt))
n = 0
for eqn in jaxpr.jaxpr.eqns:
    if eqn.primitive.name in ("gather", "scatter", "scatter-add"):
        n += 1
        if n <= 3:
            print(eqn.primitive.name, "in:", [v.aval.shape for v in eqn.invars], flush=True)
            print("  src:", eqn.source_info.traceback.frames and [f"{f.file_name}:{f.line_num} {f.function_name}" for f in eqn.source_info.traceback.frames if "judo_tpu" in f.file_name][:3], flush=True)
print("total gathers:", n, flush=True)
