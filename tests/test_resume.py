"""Checkpoint/resume: per-shard manifests make reruns idempotent and
partial — only invalidated or missing shards are reprocessed."""

import json
import os
import shutil

import pytest

from aushape_ray.config import PipelineConfig
from aushape_ray.fixtures import ensure_transcripts
from aushape_ray.state.manifest import (
    completed_shards,
    manifest_path,
    run_resumable,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "routed")


def test_resume_skips_completed_and_matches_oracle(ray_session, out_dir):
    input_dir = ensure_transcripts(SF)
    cfg = PipelineConfig()

    r1 = run_resumable(input_dir, out_dir, cfg)
    assert r1["skipped"] == 0 and r1["processed"] > 0
    counts1 = r1["sink_counts"]

    # full rerun: everything skipped, same totals
    r2 = run_resumable(input_dir, out_dir, cfg)
    assert r2["processed"] == 0
    assert r2["skipped"] == r1["processed"]
    assert r2["sink_counts"] == counts1

    # oracle comparison
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aushape_ray.oracle import assemble_events, sink_counts as osc

    tables = [pq.read_table(f) for f in sorted(glob.glob(f"{input_dir}/*.parquet"))]
    assert counts1 == osc(assemble_events(pa.concat_tables(tables)))

    # invalidate one shard (delete its manifest) -> exactly one reprocessed
    done = completed_shards(out_dir)
    victim = sorted(done)[0]
    os.remove(manifest_path(out_dir, victim))
    shutil.rmtree(os.path.join(out_dir, "shards", victim))
    r3 = run_resumable(input_dir, out_dir, cfg)
    assert r3["processed"] == 1
    assert r3["sink_counts"] == counts1


def test_manifest_records_lineage(ray_session, out_dir):
    input_dir = ensure_transcripts(SF)
    run_resumable(input_dir, out_dir, PipelineConfig())
    done = completed_shards(out_dir)
    for key, m in done.items():
        assert m["input"]["path"].endswith(key)  # key keeps the extension
        assert m["n_turns"] > 0 and m["sec"] >= 0
        for f in m["outputs"]:
            assert os.path.exists(f), f
        with open(manifest_path(out_dir, key)) as fh:
            assert json.load(fh) == m
