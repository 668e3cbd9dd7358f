"""GUI server tests: a real HTTP+WebSocket server with a live scene.

The reference instantiates a real ViserServer and asserts body count and FK
propagation (reference tests/test_visualizer.py:29-53); here the same checks
run against judo_tpu's self-contained browser GUI server.
"""

import json
import socket
import time
import urllib.request

import numpy as np
import pytest

from judo_tpu.app.bus import MessageBus
from judo_tpu.app.structs import MujocoState
from judo_tpu.visualizers import Visualizer
from judo_tpu.visualizers.server import GuiServer
from judo_tpu.visualizers.websocket import client_handshake


@pytest.fixture
def server():
    bus = MessageBus()
    viz = Visualizer(bus, "cylinder_push", "ps")
    srv = GuiServer(bus, visualizer=viz, port=0, stream_hz=60.0)
    srv.start()
    yield srv, bus, viz
    srv.stop()


def _connect_ws(port: int):
    sock = socket.create_connection(("127.0.0.1", port), timeout=5)
    sock.settimeout(5)
    return client_handshake(sock, f"127.0.0.1:{port}")


def _recv_type(conn, expected: str, tries: int = 200):
    for _ in range(tries):
        msg = json.loads(conn.recv_message())
        if msg["type"] == expected:
            return msg
    raise AssertionError(f"never received {expected}")


def test_http_serves_page_and_scene(server):
    srv, bus, viz = server
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/", timeout=5) as r:
        page = r.read().decode()
    assert r.status == 200
    assert "<canvas" in page and "WebSocket" in page

    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/api/scene", timeout=5) as r:
        hello = json.loads(r.read())
    # body count matches the compiled model (reference test_visualizer.py:35-43)
    assert len(hello["scene"]["bodies"]) == viz.scene.bodies.__len__()
    assert hello["task"] == "cylinder_push"
    assert "ps" in hello["optimizers"] and "mppi" in hello["optimizers"]
    assert {"task", "optimizer", "controller"} <= set(hello["widgets"])


def test_websocket_hello_and_fk_propagation(server):
    srv, bus, viz = server
    conn = _connect_ws(srv.port)
    hello = _recv_type(conn, "hello")
    nbody = len(hello["scene"]["bodies"])
    assert nbody == len(viz.scene.bodies)

    # publish a sim state: FK must propagate into streamed body poses
    task = type(viz.available_tasks["cylinder_push"][0]())  # class handle only
    import mujoco

    task_cls, _ = viz.available_tasks["cylinder_push"]
    t = task_cls()
    t.data.qpos[:] = [0.3, -0.2, 0.5, 0.4]
    mujoco.mj_forward(t.model, t.data)
    state = MujocoState(
        time=1.0,
        qpos=t.data.qpos.copy(),
        qvel=t.data.qvel.copy(),
        xpos=t.data.xpos.copy(),
        xquat=t.data.xquat.copy(),
        mocap_pos=None,
        mocap_quat=None,
        sim_metadata={},
    )
    bus.publish("states", state)

    deadline = time.time() + 5
    while time.time() < deadline:
        msg = _recv_type(conn, "state")
        poses = np.asarray(msg["bodies"])  # (nbody, 7)
        if np.allclose(poses[1, :3], t.data.xpos[1], atol=1e-9):
            break
    else:
        raise AssertionError("streamed pose never matched published FK")
    assert poses.shape == (nbody, 7)
    conn.close()


def test_widget_set_mutates_config(server):
    srv, bus, viz = server
    srv.handle_client_message(
        {"type": "set", "group": "optimizer", "path": ["sigma"], "value": 0.42}
    )
    assert viz.optimizer_config.sigma == pytest.approx(0.42)
    assert viz.optimizer_binding.changed.is_set()

    srv.handle_client_message(
        {"type": "set", "group": "controller", "path": ["max_opt_iters"], "value": 3}
    )
    assert viz.controller_config.max_opt_iters == 3
    assert isinstance(viz.controller_config.max_opt_iters, int)

    # config publications reach the bus (the ControllerNode contract)
    assert bus.read("optimizer_config") is viz.optimizer_config


def test_task_switch_over_websocket(server):
    srv, bus, viz = server
    conn = _connect_ws(srv.port)
    _recv_type(conn, "hello")
    conn.send_text(json.dumps({"type": "task", "name": "cartpole"}))
    hello2 = _recv_type(conn, "hello")
    assert hello2["task"] == "cartpole"
    assert bus.read("task") == "cartpole"
    # cartpole scene has different body count than cylinder_push
    assert len(hello2["scene"]["bodies"]) == len(viz.scene.bodies)
    conn.close()


def test_buttons_publish(server):
    srv, bus, viz = server
    srv.handle_client_message({"type": "reset"})
    assert bus.read("task_reset") is True
    srv.handle_client_message({"type": "pause"})
    assert bus.read("sim_pause") is True
