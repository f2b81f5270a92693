"""Start/stop a set of stage handler threads (reference ``utils/thread_manager.py``)."""

from __future__ import annotations

import logging
import threading
from collections.abc import Sequence
from typing import Any

logger = logging.getLogger(__name__)

_JOIN_TIMEOUT_S = 5.0


class ThreadManager:
    def __init__(self, handlers: Sequence[Any]) -> None:
        self.handlers = handlers
        self.threads: list[threading.Thread] = []

    def start(self) -> None:
        for handler in self.handlers:
            thread = threading.Thread(
                target=handler.run, name=type(handler).__name__, daemon=False
            )
            self.threads.append(thread)
            thread.start()

    def wait(self) -> None:
        for thread in self.threads:
            thread.join()

    def stop(self) -> None:
        for handler in self.handlers:
            handler.stop_event.set()
        for thread in self.threads:
            if thread.is_alive():
                thread.join(timeout=_JOIN_TIMEOUT_S)
                if thread.is_alive():
                    logger.warning("Thread %s did not terminate within timeout", thread.name)
