"""Threshold-batched background task queue.

Equivalent of the reference AsyncQueueManager
(src/lightning/utils/async_tools/async_queue.py:3-39): tasks accumulate and
execute in batches once a threshold is reached (used for off-critical-path
work like metric post-processing or image dumping). Thread-based rather
than asyncio — callers are synchronous training loops.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional


class AsyncQueueManager:
    def __init__(self, threshold: int = 8):
        self.threshold = threshold
        self._pending: List[Callable[[], None]] = []
        self._lock = threading.Lock()
        self._worker: Optional[threading.Thread] = None
        self._jobs: "queue.Queue" = queue.Queue()
        self._stop = object()

    def _ensure_worker(self):
        if self._worker is None or not self._worker.is_alive():
            self._worker = threading.Thread(target=self._run, daemon=True)
            self._worker.start()

    def _run(self):
        while True:
            job = self._jobs.get()
            if job is self._stop:
                break
            try:
                job()
            except Exception:  # noqa: BLE001 — background best-effort
                pass

    def submit(self, fn: Callable[[], None]):
        """Queue a task; flushes automatically at the threshold."""
        with self._lock:
            self._pending.append(fn)
            if len(self._pending) >= self.threshold:
                self._flush_locked()

    def _flush_locked(self):
        self._ensure_worker()
        for fn in self._pending:
            self._jobs.put(fn)
        self._pending = []

    def flush(self):
        with self._lock:
            self._flush_locked()

    def join(self):
        """Flush and wait for all queued work to finish."""
        self.flush()
        self._jobs.join() if False else None  # queue.join needs task_done
        # Drain by sentinel round-trip:
        done = threading.Event()
        self._jobs.put(done.set)
        self._ensure_worker()
        done.wait()

    def shutdown(self):
        self.join()
        self._jobs.put(self._stop)
