import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from judo_tpu.tasks import get_registered_tasks
from judo_tpu.physics import make_state, rollout, put_model
from judo_tpu.physics.pallas_step import rollout_lanes

task_cls, _ = get_registered_tasks()["cylinder_push"]
task = task_cls()

for dtype in (jnp.float32, jnp.float64):
    pm = put_model(task.model, dtype=dtype)
    rng = np.random.default_rng(0)
    R, T = 4, 100
    qp = np.tile(np.concatenate([task.data.qpos]), (R, 1)).astype(np.float64)
    qv = np.zeros((R, pm.nv))
    ct = 0.5 * rng.standard_normal((R, T, pm.nu))
    qp, qv, ct = (jnp.asarray(x, dtype) for x in (qp, qv, ct))

    lo = jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, backend="xla"))(qp, qv, ct)
    def one(q, v, c):
        return rollout(pm, make_state(pm, qpos=q, qvel=v), c)
    ro = jax.jit(jax.vmap(one))(qp, qv, ct)
    es = np.abs(np.asarray(ro.states) - np.asarray(lo.states))
    print(f"dtype {dtype.__name__}:")
    for t in (0, 1, 4, 24, 49, 99):
        print(f"  t={t:3d} maxerr {es[:, t].max():.3e}  |ref| {np.abs(np.asarray(ro.states)[:, t]).max():.3e}", flush=True)
