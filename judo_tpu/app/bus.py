"""In-process message bus with latest-wins topics.

The reference wires its three processes through dora-rs topics with
queue_size=1 (judo/configs/judo_dora_default.yaml; SURVEY §5.8). On a machine
whose accelerator dispatch is already asynchronous, the 3-process split
collapses into one process (SURVEY §7 stance): this bus keeps the same
topic/latest-wins contract so nodes port over unchanged, with a thread-safe
single-slot mailbox per topic.
"""

from __future__ import annotations

import threading
from typing import Any, Callable


class Topic:
    """Single-slot (latest-wins) mailbox."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._value: Any = None
        self._seq = 0

    def publish(self, value: Any) -> None:
        with self._lock:
            self._value = value
            self._seq += 1

    def read(self) -> tuple[Any, int]:
        with self._lock:
            return self._value, self._seq


class MessageBus:
    """Named topics + optional synchronous subscribers."""

    def __init__(self) -> None:
        self._topics: dict[str, Topic] = {}
        self._subs: dict[str, list[Callable[[Any], None]]] = {}
        self._lock = threading.Lock()

    def topic(self, name: str) -> Topic:
        with self._lock:
            if name not in self._topics:
                self._topics[name] = Topic()
            return self._topics[name]

    def publish(self, name: str, value: Any) -> None:
        self.topic(name).publish(value)
        for cb in self._subs.get(name, []):
            cb(value)

    def subscribe(self, name: str, callback: Callable[[Any], None]) -> None:
        with self._lock:
            self._subs.setdefault(name, []).append(callback)

    def read(self, name: str) -> Any:
        return self.topic(name).read()[0]

    def read_versioned(self, name: str) -> tuple[Any, int]:
        return self.topic(name).read()
