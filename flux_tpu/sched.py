"""Scheduler round: native (C++) work-unit dispatch with a Python fallback.

One ``SchedulerRound`` is a single pull-dispatch round over a list of work
units — the concurrency core the reference builds from crossbeam: the
bounded(1) shared channel that load-balances units across workers
(manager.rs:100,120-141), the ``CancellableIterator`` (manager.rs:365-393),
the ``WaitGroup`` barrier (manager.rs:101,166), and the completion ledger
behind flux_tpu's lost-unit retry (which the reference lacks).  Those pieces
are native Rust in the reference; here they are native C++
(native/fluxnative.cpp ``flux_sched_*``) reached over ctypes, with a
lock-based pure-Python fallback when no compiler is available.

The round object plays both roles workers expect: it is the *unit queue*
(``get()`` returns the next unit or ``None`` when drained/cancelled) and
the *wait group* (``done()`` / ``wait()``), so worker loops don't know or
care which implementation is live.
"""

from __future__ import annotations

import ctypes
import threading
from typing import List, Optional, Sequence

from .job import WorkUnit
from .native import get_lib

__all__ = ["SchedulerRound", "native_sched_available"]


def native_sched_available() -> bool:
    lib = get_lib()
    return lib is not None and hasattr(lib, "flux_sched_create")


class _PyCore:
    """Pure-Python round core (mirrors the C++ struct exactly)."""

    def __init__(self, n_units: int, n_workers: int):
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._n = n_units
        self._next = 0
        self._workers = n_workers
        self._cancelled = False
        self._completed = [False] * n_units

    def pull(self) -> int:
        with self._lock:
            if self._cancelled or self._next >= self._n:
                return -1
            i = self._next
            self._next += 1
            return i

    def complete(self, i: int) -> None:
        with self._lock:
            if 0 <= i < self._n:
                self._completed[i] = True

    def cancel(self) -> None:
        with self._lock:
            self._cancelled = True

    def cancelled(self) -> bool:
        with self._lock:
            return self._cancelled

    def worker_done(self) -> None:
        with self._cond:
            self._workers -= 1
            if self._workers <= 0:
                self._cond.notify_all()

    def wait(self, timeout: Optional[float]) -> bool:
        with self._cond:
            return self._cond.wait_for(lambda: self._workers <= 0, timeout=timeout)

    def missing(self) -> List[int]:
        with self._lock:
            return [i for i, c in enumerate(self._completed) if not c]

    def close(self) -> None:
        pass


class _NativeCore:
    """ctypes shim over the C++ flux_sched_* ABI."""

    def __init__(self, lib, n_units: int, n_workers: int):
        self._lib = lib
        self._h = lib.flux_sched_create(n_units, n_workers)
        if not self._h:
            raise RuntimeError("flux_sched_create failed")
        self._n = n_units

    def pull(self) -> int:
        return self._lib.flux_sched_pull(self._h)

    def complete(self, i: int) -> None:
        self._lib.flux_sched_complete(self._h, i)

    def cancel(self) -> None:
        self._lib.flux_sched_cancel(self._h)

    def cancelled(self) -> bool:
        return bool(self._lib.flux_sched_cancelled(self._h))

    def worker_done(self) -> None:
        self._lib.flux_sched_worker_done(self._h)

    def wait(self, timeout: Optional[float]) -> bool:
        ms = -1 if timeout is None else max(0, int(timeout * 1000))
        # ctypes releases the GIL around the call, so the barrier blocks
        # natively without starving other Python threads.
        return bool(self._lib.flux_sched_wait(self._h, ms))

    def missing(self) -> List[int]:
        out = (ctypes.c_int32 * max(self._n, 1))()
        n = self._lib.flux_sched_missing(self._h, out)
        return list(out[:n])

    def close(self) -> None:
        if self._h:
            self._lib.flux_sched_destroy(self._h)
            self._h = None


def _register(lib) -> None:
    if getattr(lib, "_flux_sched_registered", False):
        return
    lib.flux_sched_create.restype = ctypes.c_void_p
    lib.flux_sched_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.flux_sched_destroy.restype = None
    lib.flux_sched_destroy.argtypes = [ctypes.c_void_p]
    lib.flux_sched_pull.restype = ctypes.c_int32
    lib.flux_sched_pull.argtypes = [ctypes.c_void_p]
    lib.flux_sched_complete.restype = None
    lib.flux_sched_complete.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.flux_sched_cancel.restype = None
    lib.flux_sched_cancel.argtypes = [ctypes.c_void_p]
    lib.flux_sched_cancelled.restype = ctypes.c_int32
    lib.flux_sched_cancelled.argtypes = [ctypes.c_void_p]
    lib.flux_sched_worker_done.restype = None
    lib.flux_sched_worker_done.argtypes = [ctypes.c_void_p]
    lib.flux_sched_wait.restype = ctypes.c_int32
    lib.flux_sched_wait.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.flux_sched_missing.restype = ctypes.c_int32
    lib.flux_sched_missing.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int32)]
    lib._flux_sched_registered = True


class SchedulerRound:
    """One dispatch round over ``units`` pulled by ``n_workers`` workers.

    Presents the queue interface workers drain (``get()``) and the barrier
    the manager waits on (``done()``/``wait()``). ``cancel_event`` (a
    ``threading.Event``) is checked at every pull, mirroring the reference's
    producer checking cancellation before each put (manager.rs:127-133).
    """

    def __init__(
        self,
        units: Sequence[WorkUnit],
        n_workers: int,
        cancel_event: Optional[threading.Event] = None,
        force_python: bool = False,
    ):
        self._units = list(units)
        self._cancel_event = cancel_event
        lib = None if force_python else get_lib()
        if lib is not None and hasattr(lib, "flux_sched_create"):
            _register(lib)
            self._core = _NativeCore(lib, len(self._units), n_workers)
            self.native = True
        else:
            self._core = _PyCore(len(self._units), n_workers)
            self.native = False
        self._by_row = {u.row_start: i for i, u in enumerate(self._units)}

    # -- unit-queue face (what workers drain) -------------------------------
    def get(self) -> Optional[WorkUnit]:
        if self._cancel_event is not None and self._cancel_event.is_set():
            self._core.cancel()
        i = self._core.pull()
        return None if i < 0 else self._units[i]

    # -- wait-group face (what the manager blocks on) -----------------------
    def done(self) -> None:
        self._core.worker_done()

    def wait(self, timeout: Optional[float] = None) -> bool:
        return self._core.wait(timeout)

    # -- ledger --------------------------------------------------------------
    def complete_row(self, row_start: int) -> None:
        i = self._by_row.get(row_start)
        if i is not None:
            self._core.complete(i)

    def missing(self) -> List[WorkUnit]:
        return [self._units[i] for i in self._core.missing()]

    def cancel(self) -> None:
        self._core.cancel()

    def cancelled(self) -> bool:
        return self._core.cancelled()

    def close(self) -> None:
        self._core.close()
