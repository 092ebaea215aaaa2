"""Scheduler-round core: native (C++) and Python implementations.

The round is the concurrency heart of the manager (the reference's
crossbeam bounded(1) channel + CancellableIterator + WaitGroup,
manager.rs:100-166,365-393); both implementations must behave identically."""

import threading

import pytest

from flux_tpu.job import WorkUnit
from flux_tpu.sched import SchedulerRound, native_sched_available


def _units(n):
    return [WorkUnit(row_start=i * 10, row_end=i * 10 + 9, job_id=None) for i in range(n)]


FORCE = [True] + ([False] if native_sched_available() else [])
IDS = ["python"] + (["native"] if native_sched_available() else [])


@pytest.fixture(params=FORCE, ids=IDS)
def force_python(request):
    return request.param


def test_native_core_builds():
    # The environment has g++; the native scheduler must actually be there,
    # not silently fall back (the fallback is for compiler-less hosts).
    assert native_sched_available()


def test_exactly_once_handout(force_python):
    rnd = SchedulerRound(_units(100), 1, force_python=force_python)
    seen = []
    while True:
        u = rnd.get()
        if u is None:
            break
        seen.append(u.row_start)
    assert seen == [i * 10 for i in range(100)]
    assert rnd.get() is None  # drained stays drained
    rnd.close()


def test_concurrent_pulls_are_disjoint_and_complete(force_python):
    n = 500
    rnd = SchedulerRound(_units(n), 8, force_python=force_python)
    pulled = [[] for _ in range(8)]

    def worker(k):
        while True:
            u = rnd.get()
            if u is None:
                break
            pulled[k].append(u.row_start)
        rnd.done()

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    assert rnd.wait(30.0)
    for t in threads:
        t.join(5)
    allp = [r for lst in pulled for r in lst]
    assert sorted(allp) == [i * 10 for i in range(n)]  # exactly once, no loss
    rnd.close()


def test_cancellation_stops_handout(force_python):
    cancel = threading.Event()
    rnd = SchedulerRound(_units(50), 1, cancel_event=cancel, force_python=force_python)
    assert rnd.get() is not None
    cancel.set()
    assert rnd.get() is None  # checked at every pull (manager.rs:127-133)
    assert rnd.cancelled()
    rnd.close()


def test_missing_ledger(force_python):
    rnd = SchedulerRound(_units(6), 1, force_python=force_python)
    while rnd.get() is not None:
        pass
    for row in (0, 20, 50):
        rnd.complete_row(row)
    rnd.complete_row(99999)  # unknown rows are ignored
    assert [u.row_start for u in rnd.missing()] == [10, 30, 40]
    rnd.close()


def test_waitgroup_barrier_and_timeout(force_python):
    rnd = SchedulerRound(_units(1), 2, force_python=force_python)
    assert not rnd.wait(0.05)  # no worker finished yet
    rnd.done()
    assert not rnd.wait(0.05)  # one of two
    rnd.done()
    assert rnd.wait(1.0)
    rnd.close()


def test_empty_round(force_python):
    rnd = SchedulerRound([], 3, force_python=force_python)
    assert rnd.get() is None
    assert rnd.missing() == []
    for _ in range(3):
        rnd.done()
    assert rnd.wait(1.0)
    rnd.close()


def test_native_and_python_agree_under_contention():
    if not native_sched_available():
        pytest.skip("no native scheduler")
    results = {}
    for force in (False, True):
        rnd = SchedulerRound(_units(200), 4, force_python=force)
        done_rows = []
        lock = threading.Lock()

        def worker():
            while True:
                u = rnd.get()
                if u is None:
                    break
                rnd.complete_row(u.row_start)
                with lock:
                    done_rows.append(u.row_start)
            rnd.done()

        ts = [threading.Thread(target=worker) for _ in range(4)]
        for t in ts:
            t.start()
        assert rnd.wait(30.0)
        for t in ts:
            t.join(5)
        results[force] = (sorted(done_rows), [u.row_start for u in rnd.missing()])
        rnd.close()
    assert results[False] == results[True]
