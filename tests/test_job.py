"""Job / work-unit decomposition tests (job.rs semantics + fixes)."""

import pytest

from flux_tpu.job import Job, JobConfiguration, JobID, JobIDAllocator
from tests.test_render import env_sphere, make_scene


def make_job(h, rows_per_unit, w=8):
    sd = make_scene([env_sphere(1.0)], w=w, h=h)
    cfg = JobConfiguration(
        sample_root=1, max_trace_depth=1, rows_per_work_unit=rows_per_unit
    )
    return Job(id=JobID(1, 0), scene_data=sd, config=cfg)


def test_even_split():
    units = make_job(100, 25).work_units()
    assert len(units) == 4
    assert units[0].row_start == 0 and units[0].row_end == 24
    assert units[-1].row_start == 75 and units[-1].row_end == 99


def test_ragged_tail():
    units = make_job(10, 4).work_units()
    assert [(u.row_start, u.row_end) for u in units] == [(0, 3), (4, 7), (8, 9)]


def test_single_row_tail_not_dropped():
    """height % rows == 1: the reference's loop (job.rs:75, ``i < height-1``)
    silently drops the last row; ours must not."""
    units = make_job(11, 5).work_units()
    assert [(u.row_start, u.row_end) for u in units] == [(0, 4), (5, 9), (10, 10)]
    covered = sum(u.num_rows for u in units)
    assert covered == 11


def test_invalid_rows_per_unit():
    with pytest.raises(ValueError):
        make_job(10, 0).work_units()


def test_job_roundtrip():
    job = make_job(10, 4)
    back = Job.from_dict(job.to_dict())
    assert back == job


def test_id_allocator_unique():
    a = JobIDAllocator()
    ids = [a.next_id() for _ in range(3)]
    assert len(set(ids)) == 3
    assert ids[0].allocator_id == ids[1].allocator_id
    b = JobIDAllocator()
    assert b.next_id().allocator_id != ids[0].allocator_id
