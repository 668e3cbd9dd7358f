"""Browser GUI server: scene renderer + live-tunable widgets over WebSocket.

This is the render backend for the Visualizer — the role viser's ViserServer
plays in the reference (judo/visualizers/visualizer.py:24-362 owns the server,
dropdowns, buttons, plan-time display and config tabs; judo/gui.py:90-419
builds the widgets; judo/visualizers/model.py:38-302 builds the scene).
viser cannot be installed here, so the backend is self-contained: a stdlib
HTTP server serves a single-page WebGL renderer (static/index.html, no
external JS dependencies) and streams states/traces over the websocket layer
in websocket.py, while widget changes flow back through the same socket into
the ConfigBinding lock+event contract.

Protocol (JSON text frames):
  server -> client
    {"type": "hello", "scene": {...}, "widgets": {...}, "tasks": [...],
     "optimizers": [...], "task": str, "optimizer": str}
    {"type": "state", "bodies": [[x,y,z,qw,qx,qy,qz], ...],
     "traces": [[[x,y,z],[x,y,z]], ...] | null, "num_elite": int,
     "plan_time_ms": float | null}
  client -> server
    {"type": "set", "group": "task"|"optimizer"|"controller",
     "path": [...], "value": v}
    {"type": "task", "name": str} | {"type": "optimizer", "name": str}
    {"type": "reset"} | {"type": "pause"}
"""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any

import numpy as np

from judo_tpu.app.bus import MessageBus
from judo_tpu.visualizers.visualizer import Visualizer
from judo_tpu.visualizers.websocket import WebSocketConnection, handshake_response
from judo_tpu.visualizers.widgets import WidgetSpec

_STATIC = Path(__file__).parent / "static"


def _jsonable(v: Any) -> Any:
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.floating, np.integer)):
        return v.item()
    return v


def widget_to_dict(w: WidgetSpec) -> dict:
    return {
        "kind": w.kind,
        "name": w.name,
        "path": list(w.path),
        "value": _jsonable(w.value),
        "min": w.minimum,
        "max": w.maximum,
        "step": w.step,
        "options": w.options,
        "children": [widget_to_dict(c) for c in w.children],
        # goal-marker metadata (np_1d_field xyz_vis_indices): the client
        # renders these arrays as draggable 3D markers (judo/gui.py:269-316)
        "element_names": w.element_names,
        "xyz_vis_indices": w.xyz_vis_indices,
    }


class GuiServer:
    """HTTP + WebSocket GUI around a Visualizer (the ViserServer equivalent)."""

    def __init__(
        self,
        bus: MessageBus,
        ctrl_node: Any = None,
        sim_node: Any = None,
        port: int = 8008,
        visualizer: Visualizer | None = None,
        stream_hz: float = 30.0,
    ) -> None:
        self.bus = bus
        if visualizer is None:
            init_task = ctrl_node.controller.task.name if ctrl_node is not None else "cylinder_push"
            opts = None
            if ctrl_node is not None:
                from judo_tpu.optimizers import get_registered_optimizers

                opt_cls = type(ctrl_node.controller.optimizer)
                for name, (cls, _) in get_registered_optimizers().items():
                    if cls is opt_cls:
                        opts = name
                        break
            visualizer = Visualizer(bus, init_task, opts or "ps")
        self.visualizer = visualizer
        self.stream_hz = stream_hz
        self._clients: list[WebSocketConnection] = []
        self._clients_lock = threading.Lock()
        self._stop = threading.Event()

        gui = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *args: Any) -> None:  # quiet
                pass

            def do_GET(self) -> None:
                if self.path == "/ws":
                    gui._handle_websocket(self)
                    return
                if self.path in ("/", "/index.html"):
                    body = (_STATIC / "index.html").read_bytes()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                if self.path == "/api/scene":
                    body = json.dumps(gui.hello_message()).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._httpd = ThreadingHTTPServer(("0.0.0.0", port), Handler)
        self.port = self._httpd.server_address[1]
        self._server_thread: threading.Thread | None = None
        self._stream_thread: threading.Thread | None = None

    # --- lifecycle ---
    def start(self) -> None:
        self._server_thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._server_thread.start()
        self._stream_thread = threading.Thread(target=self._stream_loop, daemon=True)
        self._stream_thread.start()

    def stop(self) -> None:
        self._stop.set()
        with self._clients_lock:
            for c in self._clients:
                c.close()
            self._clients.clear()
        self._httpd.shutdown()
        self._httpd.server_close()

    # --- messages ---
    def hello_message(self) -> dict:
        v = self.visualizer
        return {
            "type": "hello",
            "scene": v.scene.to_dict(),
            "widgets": {k: [widget_to_dict(w) for w in ws] for k, ws in v.widget_tree().items()},
            "tasks": sorted(v.available_tasks),
            "optimizers": sorted(v.available_optimizers),
            "task": v.task_name,
            "optimizer": v.optimizer_name,
        }

    def state_message(self) -> dict:
        v = self.visualizer
        bodies = [
            [*map(float, b.xpos), *map(float, b.xquat)] for b in v.scene.bodies
        ]
        traces = v.scene.traces
        return {
            "type": "state",
            "bodies": bodies,
            "traces": None if traces is None else np.asarray(traces).tolist(),
            "num_elite": v.scene.num_elite_traces,
            "plan_time_ms": v.plan_time_ms,
        }

    # --- websocket plumbing ---
    def _handle_websocket(self, handler: BaseHTTPRequestHandler) -> None:
        key = handler.headers.get("Sec-WebSocket-Key")
        if not key:
            handler.send_response(400)
            handler.end_headers()
            return
        handler.connection.sendall(handshake_response(key))
        conn = WebSocketConnection(handler.connection)
        conn.send_text(json.dumps(self.hello_message()))
        with self._clients_lock:
            self._clients.append(conn)
        try:
            while not self._stop.is_set():
                msg = conn.recv_message()
                if msg is None:
                    break
                try:
                    self.handle_client_message(json.loads(msg))
                except Exception as e:  # noqa: BLE001 - bad client input must not kill the server
                    conn.send_text(json.dumps({"type": "error", "message": str(e)}))
        except (ConnectionError, OSError):
            pass
        finally:
            with self._clients_lock:
                if conn in self._clients:
                    self._clients.remove(conn)
        # keep the HTTP handler from writing anything else on this socket
        handler.close_connection = True

    def handle_client_message(self, msg: dict) -> None:
        """Apply one client action (also called directly by tests)."""
        v = self.visualizer
        kind = msg.get("type")
        if kind == "set":
            binding = {
                "task": v.task_binding,
                "optimizer": v.optimizer_binding,
                "controller": v.controller_binding,
            }[msg["group"]]
            path = tuple(str(p) for p in msg["path"])
            binding.set_value(path, self._coerce(binding.cfg, path, msg["value"]))
        elif kind == "task":
            v.set_task(msg["name"])
            self.broadcast(self.hello_message())
        elif kind == "optimizer":
            v.set_optimizer(msg["name"])
            self.broadcast(self.hello_message())
        elif kind == "reset":
            v.reset_task()
        elif kind == "pause":
            v.pause_simulation()
        else:
            raise ValueError(f"unknown message type {kind!r}")

    @staticmethod
    def _coerce(cfg: Any, path: tuple[str, ...], value: Any) -> Any:
        """Coerce a JSON value to the config field's current python type."""
        target = cfg
        for p in path[:-1]:
            if p.isdigit():
                return float(value)
            target = getattr(target, p)
        if path[-1].isdigit():
            return float(value)
        cur = getattr(target, path[-1])
        if isinstance(cur, bool):
            return bool(value)
        if isinstance(cur, int) and not isinstance(value, bool):
            return int(value)
        if isinstance(cur, float):
            return float(value)
        return value

    def broadcast(self, message: dict) -> None:
        data = json.dumps(message)
        with self._clients_lock:
            dead = []
            for c in self._clients:
                try:
                    c.send_text(data)
                except (ConnectionError, OSError):
                    dead.append(c)
            for c in dead:
                self._clients.remove(c)

    def _stream_loop(self) -> None:
        period = 1.0 / self.stream_hz
        while not self._stop.is_set():
            t0 = time.perf_counter()
            with self._clients_lock:
                has_clients = bool(self._clients)
            if has_clients:
                self.broadcast(self.state_message())
            dt = time.perf_counter() - t0
            if dt < period:
                time.sleep(period - dt)


# dataclass import kept for type reflection in widget serialization
_ = dataclasses
