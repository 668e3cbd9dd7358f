"""Stage costs through the REAL rollout_lanes path: monkeypatch internals at
build time, interleave execution, min-of-trials."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np

float(np.asarray(jnp.asarray(0.01)))

import judo_tpu.physics.lane_step as ls
import judo_tpu.physics.lane_engine as le
from judo_tpu.physics.pallas_step import LANE_COMPILER_OPTIONS, rollout_lanes
from judo_tpu.tasks.leap_cube import LeapCube

task = LeapCube()
pm = task.planning_model
R, T = 320, 100
rng = np.random.default_rng(0)
warm = np.asarray(task.optimizer_warm_start(), np.float32)
qp0 = jnp.asarray(np.tile(np.asarray(task.data.qpos, np.float32), (R, 1)))
qv0 = jnp.zeros((R, pm.nv), jnp.float32)
ct = jnp.asarray(warm[None, None] + 0.05 * rng.standard_normal((R, T, pm.nu)).astype(np.float32))

_orig_solve = ls.solve_dual_qp_l
_orig_contacts = ls.find_contacts_l
_orig_sens = ls.evaluate_sensors_l
_orig_kin = le.kinematics_l


def stub_solve(J, minv, reg, b, iterations, f_warm, lipschitz="cw", ncon_start=0,
               mus=None, diag=None, cw_v=None, in_pallas=False):
    return jnp.zeros_like(b), (jnp.ones_like(b) if cw_v is None else cw_v)


def stub_contacts(m, kin):
    # same slot structure/metadata, near-zero geometry compute: pos/normal
    # broadcast from one geom, dist huge (inactive)
    real = _orig_contacts(m, kin)
    B = kin.geom_xpos[0].shape[-1]
    C = real.ncon
    dist = jnp.full((C, B), 1.0, kin.geom_xpos[0].dtype)
    pos = jnp.broadcast_to(kin.geom_xpos[0][None], (C, 3, B))
    normal = jnp.broadcast_to(kin.geom_xpos[1][None] * 0 + jnp.asarray(1.0), (C, 3, B))
    return real._replace(dist=dist, pos=pos, normal=normal)


def stub_sens(m, kin, qpos, qvel):
    return jnp.zeros((max(m.nsensordata, 1), qpos.shape[-1]), qpos.dtype)


def build(patches):
    saved = {}
    for mod, name, repl in patches:
        saved[(mod, name)] = getattr(mod, name)
        setattr(mod, name, repl)
    try:
        fn = jax.jit(
            lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=10),
            compiler_options=LANE_COMPILER_OPTIONS,
        )
        t0 = time.perf_counter()
        jax.block_until_ready(fn(qp0, qv0, ct).states)
        print(f"[compiled in {time.perf_counter()-t0:.1f}s]", flush=True)
    finally:
        for (mod, name), v in saved.items():
            setattr(mod, name, v)
    return fn


cands = {
    "full@10": build([]),
    "no-solver": build([(ls, "solve_dual_qp_l", stub_solve)]),
    "cheap-narrowphase": build([(ls, "find_contacts_l", stub_contacts)]),
    "cheap-nphase-no-solv": build([(ls, "find_contacts_l", stub_contacts), (ls, "solve_dual_qp_l", stub_solve)]),
    "no-sensors": build([(ls, "evaluate_sensors_l", stub_sens)]),
}

results = {name: [] for name in cands}
K = 10
for _ in range(5):
    for name, fn in cands.items():
        t0 = time.perf_counter()
        outs = [fn(qp0, qv0, ct) for _ in range(K)]
        jax.block_until_ready(outs[-1].states)
        results[name].append((time.perf_counter() - t0) / K * 1e3)
for name, ts in results.items():
    print(f"{name:18s} min {min(ts):7.2f}  med {np.median(ts):7.2f} ms/call", flush=True)

# --- finer: per-pair-group ablation ---
import judo_tpu.physics.lane_collision as lc

def make_cheap(nslots):
    def k(x1, m1, s1, x2, m2, s2):
        d = jnp.sum(x1, axis=-2) * 0 + 1.0  # (P, B), inactive
        n = x1 * 0 + 1.0
        return [(d, x1, n)] * nslots
    return k

def build_group_stub(sig, nslots):
    saved = dict(lc._L_KERNELS)
    lc._L_KERNELS[sig] = make_cheap(nslots)
    try:
        fn = jax.jit(lambda a, b, c: rollout_lanes(pm, a, b, c, iterations=10),
                     compiler_options=LANE_COMPILER_OPTIONS)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(qp0, qv0, ct).states)
        print(f"[compiled in {time.perf_counter()-t0:.1f}s]", flush=True)
    finally:
        lc._L_KERNELS.clear(); lc._L_KERNELS.update(saved)
    return fn

from judo_tpu.physics.model import GEOM_BOX, GEOM_CAPSULE
cands2 = {
    "full@10 (again)": build([]),
    "stub-boxbox": build_group_stub((GEOM_BOX, GEOM_BOX), 4),
    "stub-capbox": build_group_stub((GEOM_CAPSULE, GEOM_BOX), 2),
}
results2 = {name: [] for name in cands2}
for _ in range(5):
    for name, fn in cands2.items():
        t0 = time.perf_counter()
        outs = [fn(qp0, qv0, ct) for _ in range(K)]
        jax.block_until_ready(outs[-1].states)
        results2[name].append((time.perf_counter() - t0) / K * 1e3)
for name, ts in results2.items():
    print(f"{name:18s} min {min(ts):7.2f}  med {np.median(ts):7.2f} ms/call", flush=True)
