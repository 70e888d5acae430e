"""Continuous tailing ingest (--follow, the audispd live-mode analogue,
verdict r4 item 4): rotations written WHILE the follow loop runs are
picked up incrementally, totals match the single-process oracle, and a
mid-stream kill is idempotent (re-follow redoes only unfinished shards)."""

import glob
import os
import shutil
import threading
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aushape_ray.config import PipelineConfig
from aushape_ray.fixtures import ensure_transcripts, generate_transcripts
from aushape_ray.state.manifest import (
    completed_shards,
    manifest_path,
    run_follow,
    run_resumable,
)


def _write_rotations(src_table: pa.Table, dest: str, n_rot: int) -> list[str]:
    """Split a transcript table into n_rot conversation-contiguous
    rotation files (sorted by conv_id so footer ranges are disjoint —
    the same guarantee log rotation gives)."""
    idx = pa.compute.sort_indices(
        src_table, sort_keys=[("conv_id", "ascending"),
                              ("turn_idx", "ascending")])
    t = src_table.take(idx)
    convs = t.column("conv_id").to_pylist()
    uniq = sorted(set(convs))
    per = max(1, len(uniq) // n_rot)
    groups = [set(uniq[i:i + per]) for i in range(0, len(uniq), per)]
    paths = []
    os.makedirs(dest, exist_ok=True)
    for gi, g in enumerate(groups):
        sub = t.filter(pa.array([c in g for c in convs]))
        p = os.path.join(dest, f"rot-{gi:03d}.parquet")
        pq.write_table(sub, p + ".tmp")
        os.replace(p + ".tmp", p)
        paths.append(p)
    return paths


def _oracle_counts(input_dir: str) -> dict:
    from aushape_ray.oracle import assemble_events, sink_counts

    tables = [pq.read_table(f)
              for f in sorted(glob.glob(f"{input_dir}/*.parquet"))]
    return sink_counts(assemble_events(pa.concat_tables(tables)))


def test_follow_picks_up_live_rotations(ray_session, tmp_path):
    """Rotations appear WHILE the loop runs; the follow must process all
    of them and match the oracle exactly."""
    src = pq.read_table(
        os.path.join(ensure_transcripts("/root/testdata/sf0.001")))
    staging = str(tmp_path / "staging")
    live = str(tmp_path / "live")
    out = str(tmp_path / "out")
    stop = str(tmp_path / "STOP")
    rotations = _write_rotations(src, staging, n_rot=6)
    os.makedirs(live, exist_ok=True)

    def producer():
        for i, p in enumerate(rotations):
            # atomic publish into the watched dir, spread over time
            dst = os.path.join(live, os.path.basename(p))
            shutil.copy(p, dst + ".part")
            os.replace(dst + ".part", dst)
            time.sleep(0.4)
        # let the consumer drain, then pull the kill switch
        time.sleep(2.5)
        open(stop, "w").close()

    th = threading.Thread(target=producer)
    th.start()
    res = run_follow(live, out, PipelineConfig(), poll_interval=0.2,
                     stop_file=stop)
    th.join()
    assert res["stopped_by"] == "stop_file"
    assert res["processed"] == len(rotations)
    assert res["sink_counts"] == _oracle_counts(live)
    # a later batch --resume run over the same dir has nothing to do
    r2 = run_resumable(live, out, PipelineConfig())
    assert r2["processed"] == 0 and r2["sink_counts"] == res["sink_counts"]


def test_follow_midstream_kill_is_idempotent(ray_session, tmp_path):
    """Kill drill: the first follow dies after the early rotations (we
    simulate the kill with max_polls + injected crash state); the second
    follow redoes ONLY the unfinished work and totals stay exact."""
    src = pq.read_table(
        os.path.join(ensure_transcripts("/root/testdata/sf0.001")))
    live = str(tmp_path / "live")
    out = str(tmp_path / "out")
    rotations = _write_rotations(src, str(tmp_path / "staging"), n_rot=4)
    os.makedirs(live, exist_ok=True)
    # first two rotations exist when the "process" starts...
    for p in rotations[:2]:
        shutil.copy(p, os.path.join(live, os.path.basename(p)))
    r1 = run_follow(live, out, PipelineConfig(), poll_interval=0.05,
                    max_polls=2)
    assert r1["processed"] == 2
    # ... then it is killed mid-stream: one shard's manifest was written
    # but the next rotation arrived unprocessed; also corrupt one shard
    # as if the writer died between rename and manifest
    victim = sorted(completed_shards(out))[0]
    os.remove(manifest_path(out, victim))
    for p in rotations[2:]:
        shutil.copy(p, os.path.join(live, os.path.basename(p)))
    r2 = run_follow(live, out, PipelineConfig(), poll_interval=0.05,
                    max_polls=2)
    # redone: the manifest-less victim + the two new rotations
    assert r2["processed"] == 3
    assert r2["skipped_final"] == 4
    assert r2["sink_counts"] == _oracle_counts(live)


def test_follow_detects_changed_rotation(ray_session, tmp_path):
    """A rotation whose bytes change after processing (fingerprint
    mismatch) is re-processed; totals reflect the NEW content."""
    live = str(tmp_path / "live")
    out = str(tmp_path / "out")
    os.makedirs(live, exist_ok=True)
    t1 = generate_transcripts(20)
    pq.write_table(t1, os.path.join(live, "rot-000.parquet"))
    r1 = run_follow(live, out, PipelineConfig(), poll_interval=0.05,
                    max_polls=1)
    assert r1["processed"] == 1
    # rewrite the rotation with different content (more conversations)
    t2 = generate_transcripts(40, seed=99)
    time.sleep(0.02)  # ensure a distinct mtime_ns is plausible everywhere
    pq.write_table(t2, os.path.join(live, "rot-000.parquet"))
    r2 = run_follow(live, out, PipelineConfig(), poll_interval=0.05,
                    max_polls=1)
    assert r2["processed"] == 1
    assert r2["sink_counts"] == _oracle_counts(live)


def test_follow_idle_timeout_and_empty_dir(ray_session, tmp_path):
    """An empty (even not-yet-created) input dir is a normal live start;
    idle_timeout ends the loop cleanly with zero work."""
    res = run_follow(str(tmp_path / "nowhere"), str(tmp_path / "out"),
                     PipelineConfig(), poll_interval=0.05, idle_timeout=0.3)
    assert res["stopped_by"] == "idle_timeout"
    assert res["processed"] == 0
    assert res["sink_counts"] == {}
