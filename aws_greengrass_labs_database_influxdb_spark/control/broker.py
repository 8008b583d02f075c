"""In-process pub/sub broker — the IPC stand-in.

The reference vends tokens over Greengrass IPC topics
(``src/influxDBTokenPublisher.py:93-136`` subscribe,
``src/influxDBTokenStreamHandler.py:122-154`` publish, with a separate
client for publishing and 10 s timeouts). In-process, that collapses
to a topic → handlers dict with the same error-resilience contract:
a handler exception is logged and swallowed so the stream stays open
(``influxDBTokenStreamHandler.py:57-70``).
"""

from __future__ import annotations

import json
import logging
import threading
from collections.abc import Callable

logger = logging.getLogger(__name__)

Handler = Callable[[str, dict], None]


class Broker:
    def __init__(self):
        self._subs: dict[str, list[Handler]] = {}
        self._lock = threading.Lock()
        self.delivered: int = 0

    def subscribe(self, topic: str, handler: Handler) -> None:
        with self._lock:
            self._subs.setdefault(topic, []).append(handler)

    def unsubscribe(self, topic: str, handler: Handler) -> None:
        with self._lock:
            if topic in self._subs and handler in self._subs[topic]:
                self._subs[topic].remove(handler)

    def publish(self, topic: str, message: dict | str) -> int:
        """Deliver to current subscribers; handler errors are swallowed
        (stream stays open, like the reference's stream handler)."""
        payload = json.loads(message) if isinstance(message, str) else message
        with self._lock:
            handlers = list(self._subs.get(topic, []))
        n = 0
        for h in handlers:
            try:
                h(topic, payload)
                n += 1
            except Exception:
                logger.exception("handler error on topic %s (stream stays open)", topic)
        self.delivered += n
        return n
