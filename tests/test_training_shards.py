"""prepare_shards (pipelines/training.py): conservation, scalar pack
parity, stage- and per-shard resume, fingerprint invalidation."""

import glob
import json
import os
import shutil

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
K1, K2, M = 2654435761, 2246822519, 1 << 32


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "shards_out")


def _run(out_dir, **kw):
    from aushape_ray.pipelines.training import prepare_shards

    return prepare_shards(SF, out_dir, n_shards=4, capacity=64, **kw)


def _scalar_reference(out_dir, n_shards=4, capacity=64):
    """Pure-python shard/pack replay over the checkpointed token counts."""
    rows = pq.read_table(os.path.join(out_dir, "_tokens")).to_pandas()
    out = {}
    for s in range(n_shards):
        sub = []
        for did, nt in zip(rows["doc_id"], rows["n_tokens"]):
            r = int(did) % M
            if (r * K1) % M % n_shards == s:
                sub.append(((r * K2) % M, int(did), int(nt)))
        sub.sort()
        packs, fill = 0, None
        for _h2, _did, nt in sub:
            if fill is None or fill + nt > capacity:
                packs += 1
                fill = 0
            fill += nt
        out[s] = {"n_docs": len(sub),
                  "n_tokens": sum(x[2] for x in sub),
                  "n_packs": packs}
    return out


def test_conservation_and_scalar_parity(ray_session, out_dir):
    res = _run(out_dir)
    assert res["conserved"]
    assert res["resumed_shards"] == [] and not res["resumed_tokens"]
    assert sorted(s["shard"] for s in res["shards"]) == [0, 1, 2, 3]
    assert sum(s["n_tokens"] for s in res["shards"]) == res["total_tokens"]
    ref = _scalar_reference(out_dir)
    for s in res["shards"]:
        want = ref[s["shard"]]
        assert (s["n_docs"], s["n_tokens"], s["n_packs"]) == (
            want["n_docs"], want["n_tokens"], want["n_packs"]), s
    # every shard dir holds a pack index whose totals match the summary
    for s in res["shards"]:
        idx = pq.read_table(os.path.join(
            out_dir, "shards", f"shard={s['shard']}", "packs.parquet"))
        assert idx.num_rows == s["n_packs"]
        assert sum(idx.column("n_tokens").to_pylist()) == s["n_tokens"]
        # no pack exceeds capacity unless it is a single oversize doc
        for nt, nd in zip(idx.column("n_tokens").to_pylist(),
                          idx.column("n_docs").to_pylist()):
            assert nt <= 64 or nd == 1


def test_full_resume_skips_everything(ray_session, out_dir):
    first = _run(out_dir)
    again = _run(out_dir, resume=True)
    assert again["resumed_tokens"]
    assert again["resumed_shards"] == [0, 1, 2, 3]
    assert again["shards"] == first["shards"]


def test_partial_resume_rebuilds_only_missing_shard(ray_session, out_dir):
    first = _run(out_dir)
    # simulate a mid-run failure: shard 2's output vanished
    shutil.rmtree(os.path.join(out_dir, "shards", "shard=2"))
    os.remove(os.path.join(out_dir, "_manifests", "shard_2.json"))
    res = _run(out_dir, resume=True)
    assert res["resumed_tokens"]
    assert res["resumed_shards"] == [0, 1, 3]
    assert res["shards"] == first["shards"]
    assert res["conserved"]


def test_fingerprint_invalidation(ray_session, out_dir):
    _run(out_dir)
    man_path = os.path.join(out_dir, "_manifests", "tokens.json")
    man = json.load(open(man_path))
    man["input"]["mtime_ns"] += 1  # pretend the source changed
    json.dump(man, open(man_path, "w"))
    res = _run(out_dir, resume=True)
    assert not res["resumed_tokens"]  # stale fingerprint -> recompute
