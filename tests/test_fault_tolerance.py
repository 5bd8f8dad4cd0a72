"""Transient-failure tolerance: Ray retries a failed map task and the
pipeline completes with exact results (SURVEY.md §4 stragglers/retries —
'free' via Ray task retries, verified here rather than assumed)."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def test_map_task_retry_exactness(ray_session):
    marker_dir = tempfile.mkdtemp(prefix="wwr_fault_")

    def flaky(batch: pa.Table) -> pa.Table:
        # fail the FIRST attempt that sees doc 37; the retry (and every
        # other task) succeeds — marker file survives across attempts
        ids = batch["id"].to_pylist()
        marker = os.path.join(marker_dir, "failed_once")
        if 37 in ids and not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected transient failure")
        return pa.table({"id": batch["id"], "twice": pc.multiply(batch["id"], 2)})

    # retry_exceptions opts application-level errors into Ray's task retry
    # (system failures — worker death — retry by default); stages touching
    # flaky external IO should set this
    ds = rd.range(100, override_num_blocks=8).map_batches(
        flaky, batch_format="pyarrow", retry_exceptions=True
    )
    out = ds.to_pandas().sort_values("id", ignore_index=True)
    assert os.path.exists(os.path.join(marker_dir, "failed_once"))  # it DID fail
    assert out["id"].tolist() == list(range(100))  # and still completed exactly
    assert out["twice"].tolist() == [2 * i for i in range(100)]
