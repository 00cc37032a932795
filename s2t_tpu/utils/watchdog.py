"""Hang watchdog (reference: fairseq/distributed/distributed_timeout_wrapper.py
— a side thread that kills ranks stuck in a collective after N seconds).

Here: a heartbeat thread; if ``beat()`` isn't called within ``timeout``
seconds the handler fires (default: dump Python stacks and raise SIGABRT so
the scheduler restarts the job instead of burning a slice on a hang).
"""

from __future__ import annotations

import faulthandler
import logging
import os
import signal
import threading
import time
from typing import Callable, Optional

logger = logging.getLogger("s2t_tpu.watchdog")


class Watchdog:
    def __init__(
        self,
        timeout: float,
        on_timeout: Optional[Callable[[], None]] = None,
        kill: bool = True,
    ):
        self.timeout = timeout
        self.on_timeout = on_timeout
        self.kill = kill
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._fired = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def _run(self):
        while not self._stop.wait(min(self.timeout / 4, 5.0)):
            if time.monotonic() - self._last > self.timeout:
                self._fired.set()
                logger.error(
                    "watchdog: no heartbeat for %.0fs — dumping stacks",
                    self.timeout,
                )
                faulthandler.dump_traceback(all_threads=True)
                if self.on_timeout is not None:
                    self.on_timeout()
                if self.kill:
                    os.kill(os.getpid(), signal.SIGABRT)
                return

    def start(self) -> "Watchdog":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def beat(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=1.0)

    @property
    def fired(self) -> bool:
        return self._fired.is_set()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()
