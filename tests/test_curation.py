"""End-to-end curation pipeline: route correctness on a hand-constructed
corpus (every doc's fate known by construction), stage-level resume, and
fingerprint invalidation."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _corpus() -> pa.Table:
    # near-dup pair: repeated phrase base + a small suffix delta (byte
    # 5-gram Jaccard ~0.7, well over the 0.5 verify threshold)
    base = "the data is in the table and it is a fine day to scan of rows " * 6
    good_a = "the cat is in the hat and it is a good day to be of cheer"
    needle_doc = ("the alpha and bravo of charlie to delta in echo is "
                  "foxtrot it golf")  # doc_id 74 (% 37 == 0) -> needle donor
    contam = ("we note the alpha and bravo of charlie to delta appears "
              "here and it is in full")
    docs = {
        1: good_a,                                  # kept
        2: good_a,                                  # exact_dup of 1
        3: base,                                    # kept (near-dup rep)
        4: base + "plus extra suffix tokens here",  # near_dup of 3
        5: contam,                                  # contaminated (has needle)
        6: "zz yy",                                 # low_quality (score 30)
        7: "el la de que y los las un",             # low_quality (lang es)
        8: "it is a fair wind and the boat is of oak to sail in spring",
        9: "the oven is hot and it is wise to bake a loaf of rye in turns",
        74: needle_doc,                             # contaminated (self-hit)
    }
    ids = sorted(docs)
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([docs[i] for i in ids], pa.string()),
    })


@pytest.fixture()
def corpus_dir(tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(_corpus(), str(d / "documents.parquet"))
    return str(d)


def _routes(out_dir: str) -> dict:
    import ray.data

    got = {}
    for stage in ("low_quality", "exact_dup", "contaminated", "near_dup"):
        t = ray.data.read_parquet(
            os.path.join(out_dir, "_rejects", stage)).to_pandas()
        got[stage] = sorted(t["doc_id"].tolist())
    return got


def test_curation_routes_exact(ray_session, corpus_dir, tmp_path):
    from aushape_ray.pipelines.curation import curate_corpus

    out = str(tmp_path / "out")
    res = curate_corpus(corpus_dir, out)
    assert res["resumed_stages"] == []
    assert _routes(out) == {
        "low_quality": [6, 7],
        "exact_dup": [2],
        "contaminated": [5, 74],
        "near_dup": [4],
    }
    assert res["routes"] == {"low_quality": 2, "exact_dup": 1,
                             "contaminated": 2, "near_dup": 1}
    import ray.data

    kept = ray.data.read_parquet(os.path.join(out, "kept")).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 3, 8, 9]
    assert res["kept"] == 4


def test_curation_resume_skips_and_invalidates(ray_session, corpus_dir,
                                               tmp_path):
    from aushape_ray.pipelines.curation import curate_corpus

    out = str(tmp_path / "out")
    first = curate_corpus(corpus_dir, out)
    # resume on unchanged input: every stage skipped, same answer
    second = curate_corpus(corpus_dir, out, resume=True)
    assert second["resumed_stages"] == ["low_quality", "exact_dup",
                                        "contaminated", "near_dup"]
    assert second["routes"] == first["routes"]
    assert second["kept"] == first["kept"]
    # changed input invalidates the fingerprint: everything recomputes
    t = _corpus().append_column(
        "extra", pa.array([0] * 10, pa.int64()))
    t = t.select(["doc_id", "text"])  # same logical content, new file
    pq.write_table(t, os.path.join(corpus_dir, "documents.parquet"))
    third = curate_corpus(corpus_dir, out, resume=True)
    assert third["resumed_stages"] == []
    assert third["routes"] == first["routes"]


def test_cli_curate(ray_session, corpus_dir, tmp_path, capsys):
    """`python -m aushape_ray IN OUT --curate --resume` runs the curation
    pipeline and prints its JSON result."""
    import json

    from aushape_ray.__main__ import main

    out = tmp_path / "out"
    rc = main([corpus_dir, str(out), "--curate"])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["kept"] == 4
    assert res["routes"]["near_dup"] == 1
    # resume via the CLI skips all stages
    rc = main([corpus_dir, str(out), "--curate", "--resume"])
    assert rc == 0
    res2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res2["resumed_stages"]) == 4
