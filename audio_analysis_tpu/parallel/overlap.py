"""
Host/device overlap: render matplotlib figures on a dedicated worker thread
while the main thread keeps dispatching device compute.

SURVEY §7 ("honest speed accounting"): plotting is a large serial host cost
in the reference stack — every analysis blocks on savefig before the next
one starts. Here the report suite submits each block's figure rendering to
ONE worker thread and immediately proceeds to the next block's device
dispatch, so the device (and the tunnel round-trips) and the matplotlib
rasteriser run concurrently.

Matplotlib (pyplot + Agg) is not thread-safe across threads, so ALL figure
work is confined to the single worker thread; the main thread only touches
numpy results. `drain()` re-raises the first worker exception so failures
keep the per-tap isolation semantics of the bundle runner.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional


class PlotWorker:
    """Single-thread executor for figure rendering jobs (FIFO order)."""

    def __init__(self) -> None:
        self._queue: "queue.Queue[Optional[Callable[[], None]]]" = queue.Queue()
        self._errors: List[BaseException] = []
        self._thread = threading.Thread(target=self._run, name="plot-worker", daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            job = self._queue.get()
            if job is None:
                return
            try:
                job()
            except BaseException as exc:  # noqa: BLE001 — re-raised in drain()
                self._errors.append(exc)

    def submit(self, job: Callable[[], None]) -> None:
        self._queue.put(job)

    def drain(self) -> None:
        """Block until every submitted job ran; re-raise the first failure."""
        done = threading.Event()
        self._queue.put(done.set)
        done.wait()
        if self._errors:
            raise self._errors[0]

    def close(self) -> None:
        self._queue.put(None)
        self._thread.join(timeout=60)


class MaybePlotWorker:
    """
    PlotWorker when overlap is enabled, synchronous execution otherwise —
    one code path for callers.
    """

    def __init__(self, enabled: bool) -> None:
        self._worker = PlotWorker() if enabled else None

    def submit(self, job: Callable[[], None]) -> None:
        if self._worker is None:
            job()
        else:
            self._worker.submit(job)

    def drain(self) -> None:
        if self._worker is not None:
            self._worker.drain()

    def close(self) -> None:
        if self._worker is not None:
            self._worker.close()

    def __enter__(self) -> "MaybePlotWorker":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        try:
            if exc_type is None:
                self.drain()
        finally:
            self.close()
