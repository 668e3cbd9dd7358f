"""Sensor evaluation (position-stage sensors).

The reference harvests ``framepos`` sensors for rollout traces
(judo/visualizers/utils.py:169-190) and tasks index into sensordata
(judo/tasks/base.py:180-204); this module produces the same flat sensordata
layout from the JAX pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp

from judo_tpu.ops.math import quat_mul
from judo_tpu.physics.model import (
    SENSOR_FRAMEPOS,
    SENSOR_FRAMEQUAT,
    SENSOR_FRAMEXAXIS,
    SENSOR_FRAMEYAXIS,
    SENSOR_FRAMEZAXIS,
    SENSOR_JOINTPOS,
    SENSOR_JOINTVEL,
    _OBJ_BODY,
    _OBJ_SITE,
    _OBJ_XBODY,
    PhysicsModel,
)
from judo_tpu.physics.smooth import Kinematics


def evaluate_sensors(
    m: PhysicsModel, kin: Kinematics, qpos: jnp.ndarray | None = None, qvel: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Flat (nsensordata,) vector matching MuJoCo's sensordata layout."""
    dtype = kin.xpos.dtype
    out = jnp.zeros(m.nsensordata, dtype)
    for i in range(m.nsensor):
        stype = m.sensor_type[i]
        objtype = m.sensor_objtype[i]
        objid = m.sensor_objid[i]
        adr = m.sensor_adr[i]
        if stype == SENSOR_JOINTPOS and qpos is not None:
            out = out.at[adr].set(qpos[m.jnt_qposadr[objid]])
        elif stype == SENSOR_JOINTVEL and qvel is not None:
            out = out.at[adr].set(qvel[m.jnt_dofadr[objid]])
        elif stype == SENSOR_FRAMEPOS:
            if objtype == _OBJ_SITE:
                val = kin.site_xpos[objid]
            elif objtype in (_OBJ_BODY, _OBJ_XBODY):
                val = kin.xipos[objid] if objtype == _OBJ_BODY else kin.xpos[objid]
            else:
                continue  # unsupported frame object: leave zeros
            # relative to a reference frame when specified (mjSENS_FRAMEPOS ref)
            refid = m.sensor_refid[i]
            if refid >= 0 and m.sensor_reftype[i] == _OBJ_SITE:
                val = kin.site_xmat[refid].T @ (val - kin.site_xpos[refid])
            out = out.at[adr : adr + 3].set(val)
        elif stype in (SENSOR_FRAMEXAXIS, SENSOR_FRAMEYAXIS, SENSOR_FRAMEZAXIS):
            col = {SENSOR_FRAMEXAXIS: 0, SENSOR_FRAMEYAXIS: 1, SENSOR_FRAMEZAXIS: 2}[stype]
            if objtype == _OBJ_SITE:
                val = kin.site_xmat[objid][:, col]
            elif objtype in (_OBJ_BODY, _OBJ_XBODY):
                val = kin.xmat[objid][:, col]
            else:
                continue
            out = out.at[adr : adr + 3].set(val)
        elif stype == SENSOR_FRAMEQUAT:
            if objtype == _OBJ_SITE:
                b = m.site_bodyid[objid]
                val = quat_mul(kin.xquat[b], m.site_quat[objid])
            elif objtype in (_OBJ_BODY, _OBJ_XBODY):
                val = quat_mul(kin.xquat[objid], m.body_iquat[objid]) if objtype == _OBJ_BODY else kin.xquat[objid]
            else:
                continue
            out = out.at[adr : adr + 4].set(val)
        # other sensor types: zeros for now (extended as tasks require them)
    return out
