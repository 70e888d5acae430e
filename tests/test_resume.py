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


def test_rawlog_chain_crash_resume_byte_identical(ray_session, tmp_path):
    """End-to-end multi-source resume drill: raw auditd rotations (one
    gzipped) -> routed events (state/manifest.run_resumable) -> documents
    -> packed training shards (pipelines/training.prepare_shards), with
    deterministic crash-state injection between the two runs:

      shard A: manifest deleted, data kept   (died between the output
               rename and the manifest write)
      shard B: manifest + data deleted       (died before the rename)
      stray .tmp dir left behind             (died mid-write elsewhere)

    The injections cover every reachable crash window of the
    write-data -> rename -> write-manifest protocol (a manifest can never
    exist without its data because it is written last).  The resumed
    chain's on-disk output must be BYTE-identical to an uninterrupted
    chain's, at both layers."""
    import glob
    import gzip

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aushape_ray.fixtures import transcripts_path
    from aushape_ray.pipelines.training import prepare_shards
    from aushape_ray.sources.rawlog import write_audit_log
    from aushape_ray.state.manifest import (completed_shards, manifest_path,
                                            run_resumable)

    # --- rotations: 3 conversation-contiguous chunks, middle one gzipped
    src = pq.read_table(transcripts_path(SF)).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    conv = src.column("conv_id").to_pylist()
    bounds = [0]
    for frac in (1, 2):
        j = (len(conv) * frac) // 3
        while j < len(conv) and conv[j] == conv[j - 1]:
            j += 1
        bounds.append(j)
    bounds.append(len(conv))
    logs = str(tmp_path / "logs")
    os.makedirs(logs)
    names = ["audit.log.1", "audit.log.2.gz", "audit.log.3"]
    for i, name in enumerate(names):
        n = write_audit_log(src.slice(bounds[i], bounds[i + 1] - bounds[i]),
                            os.path.join(logs, name), sanitize=True)
        assert n > 0
    with gzip.open(os.path.join(logs, names[1]), "rt") as f:
        assert "msg=audit(" in f.readline()  # really compressed + readable

    cfg = PipelineConfig(with_text=True)

    def docs_from_events(out_dir: str, tag: str) -> str:
        """Stage-2 input derived from stage-1 output (the composed chain):
        every routed event doc becomes one document row."""
        rows = []
        for f in sorted(glob.glob(f"{out_dir}/shards/*/sink=*.parquet")):
            t = pq.read_table(f, columns=["conv_id", "doc"])
            rows += list(zip(t.column("conv_id").to_pylist(),
                             t.column("doc").to_pylist()))
        rows.sort()
        sf = str(tmp_path / tag)
        os.makedirs(sf, exist_ok=True)
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }), os.path.join(sf, "documents.parquet"))
        return sf

    def tree_bytes(root: str) -> dict:
        out = {}
        for path in sorted(glob.glob(f"{root}/**/*.parquet", recursive=True)):
            with open(path, "rb") as f:
                out[os.path.relpath(path, root)] = f.read()
        return out

    # --- chain A: uninterrupted
    out_a = str(tmp_path / "events_a")
    ra = run_resumable(logs, out_a, cfg, input_format="rawlog")
    assert ra["processed"] == 3 and sum(ra["sink_counts"].values()) > 0
    # gz regression guard: EVERY rotation (incl. the gzipped one) must
    # contribute events — a plain-text read of the .gz would yield 0
    for key, man in completed_shards(out_a).items():
        assert man["n_events"] > 0, key
    sf_a = docs_from_events(out_a, "docs_a")
    shards_a = str(tmp_path / "shards_a")
    pa_res = prepare_shards(sf_a, shards_a, n_shards=3, capacity=64,
                            num_merges=8)
    assert pa_res["conserved"]

    # --- chain B: run, crash-inject, resume
    out_b = str(tmp_path / "events_b")
    rb = run_resumable(logs, out_b, cfg, input_format="rawlog")
    assert rb["sink_counts"] == ra["sink_counts"]
    keys = sorted(completed_shards(out_b))
    assert len(keys) == 3
    os.remove(manifest_path(out_b, keys[0]))                   # window 1
    os.remove(manifest_path(out_b, keys[1]))                   # window 2
    shutil.rmtree(os.path.join(out_b, "shards", keys[1]))
    os.makedirs(os.path.join(out_b, "shards", keys[2] + ".tmp"))  # stray tmp
    rb2 = run_resumable(logs, out_b, cfg, input_format="rawlog")
    assert rb2["processed"] == 2 and rb2["skipped"] == 1
    assert rb2["sink_counts"] == ra["sink_counts"]

    sf_b = docs_from_events(out_b, "docs_b")
    shards_b = str(tmp_path / "shards_b")
    prepare_shards(sf_b, shards_b, n_shards=3, capacity=64, num_merges=8)
    # crash-inject at the training layer, then resume
    os.remove(os.path.join(shards_b, "_manifests", "shard_1.json"))
    shutil.rmtree(os.path.join(shards_b, "shards", "shard=2"))
    os.makedirs(os.path.join(shards_b, "shards", "shard=0.tmp"),
                exist_ok=True)
    pb_res = prepare_shards(sf_b, shards_b, resume=True, n_shards=3,
                            capacity=64, num_merges=8)
    assert pb_res["resumed_tokens"]
    assert pb_res["resumed_shards"] == [0]
    assert pb_res["conserved"]

    # --- byte-identical at both layers
    ea, eb = tree_bytes(f"{out_a}/shards"), tree_bytes(f"{out_b}/shards")
    assert list(ea) == list(eb) and ea == eb
    ta, tb = tree_bytes(f"{shards_a}/shards"), tree_bytes(f"{shards_b}/shards")
    assert list(ta) == list(tb) and ta == tb
