import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from judo_tpu.tasks.leap_cube import LeapCube
from judo_tpu.physics import lane_step as ls
from judo_tpu.physics.solver import num_constraint_rows

task = LeapCube()
pm = task.planning_model
nefc = num_constraint_rows(pm)
B = 128
dt = jnp.float32

def f(qp, qv, ct, fw):
    out = ls.step_l(pm, qp, qv, ct, fw)
    return out

jaxpr = jax.make_jaxpr(f)(
    jnp.zeros((pm.nq, B), dt), jnp.zeros((pm.nv, B), dt),
    jnp.zeros((pm.nu, B), dt), jnp.zeros((nefc, B), dt))

def walk(jx, path):
    for eqn in jx.eqns:
        if eqn.primitive.name in ("gather", "scatter", "scatter-add", "dynamic_slice", "dynamic_update_slice"):
            frames = [f"{fr.file_name.split('/')[-1]}:{fr.line_num} {fr.function_name}"
                      for fr in (eqn.source_info.traceback.frames if eqn.source_info.traceback else [])
                      if "judo_tpu" in fr.file_name or "lane" in fr.file_name]
            print(f"{path} {eqn.primitive.name}: in={[tuple(v.aval.shape) for v in eqn.invars]} out={[tuple(v.aval.shape) for v in eqn.outvars]}")
            print("   src:", frames[:4])
        for k, v in eqn.params.items():
            vals = v if isinstance(v, (list, tuple)) else [v]
            for item in vals:
                if hasattr(item, "jaxpr"):
                    walk(item.jaxpr, path + f"/{eqn.primitive.name}")

walk(jaxpr.jaxpr, "top")
print("done")
