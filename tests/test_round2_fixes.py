"""Regression tests for the round-2 advisor fixes: stale-manifest totals,
hash_join null keys + dtype preservation, HLL null handling."""

import numpy as np
import pyarrow as pa
import pytest


class TestManifestOrphans:
    def test_stale_manifests_excluded_from_totals(self, ray_session, tmp_path):
        import shutil

        from aushape_ray.config import PipelineConfig
        from aushape_ray.fixtures import ensure_transcripts
        from aushape_ray.state.manifest import run_resumable

        src = ensure_transcripts("/root/testdata/sf0.001")
        in_dir = tmp_path / "in"
        out_dir = str(tmp_path / "out")
        shutil.copytree(src, in_dir)
        cfg = PipelineConfig(num_parts=4)
        first = run_resumable(str(in_dir), out_dir, cfg)
        assert first["processed"] > 0

        # drop one input shard: its manifest is now stale
        import glob
        import os

        victim = sorted(glob.glob(str(in_dir / "*.parquet")))[0]
        os.remove(victim)
        second = run_resumable(str(in_dir), out_dir, cfg)
        assert second["processed"] == 0
        assert second["skipped"] == first["processed"] - 1
        # totals shrink: the orphaned shard's counts are excluded
        assert sum(second["sink_counts"].values()) < \
            sum(first["sink_counts"].values())
        assert len(second["orphaned_shards"]) == 1


class TestHashJoinFixes:
    def test_null_key_raises(self, ray_session):
        import ray.data

        from aushape_ray.functions.joins import hash_join

        left = pa.table({"k": pa.array([1, None], pa.int64()),
                         "a": pa.array([1, 2], pa.int64())})
        right = pa.table({"k2": pa.array([1], pa.int64()),
                          "b": pa.array([9], pa.int64())})
        with pytest.raises(Exception, match="null"):
            hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      "k", "k2").take_all()

    def test_left_join_preserves_int64_and_big_values(self, ray_session):
        import ray.data

        from aushape_ray.functions.joins import hash_join

        big = (1 << 60) + 7  # would corrupt through a float64 roundtrip
        left = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                         "a": pa.array([big, big + 1, big + 2], pa.int64())})
        right = pa.table({"k2": pa.array([1, 3], pa.int64()),
                          "b": pa.array([big + 10, big + 30], pa.int64())})
        # n_buckets=1 forces matched AND unmatched rows into ONE bucket:
        # a pandas-level merge would upcast the right columns to float64
        # there and silently round big back to 2^60
        out = hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                        "k", "k2", how="left", n_buckets=1)
        t = pa.concat_tables([b for b in out.iter_batches(batch_format="pyarrow")])
        assert t.schema.field("a").type == pa.int64()
        assert t.schema.field("b").type == pa.int64()
        rows = {r["k"]: r for r in t.to_pylist()}
        assert rows[1]["a"] == big and rows[1]["b"] == big + 10
        assert rows[2]["b"] is None and rows[2]["k2"] is None
        assert rows[3]["b"] == big + 30


def test_hll_ignores_nulls():
    from aushape_ray.functions.sketches import HyperLogLog

    a = HyperLogLog()
    a.add_many(["x", "y", None, None])
    b = HyperLogLog()
    b.add_many(["x", "y"])
    assert (a.registers == b.registers).all()

    empty = HyperLogLog()
    empty.add_many([None, None])
    assert empty.estimate() == 0 or (empty.registers == 0).all()


def test_mktsegment_inner_join_drops_unmatched(ray_session, tmp_path):
    """An order whose customer is missing must NOT appear (inner-join
    parity with the oracle)."""
    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_mktsegment_orders

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["A", "B"], pa.string()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 99], pa.int64()),  # 99: no customer
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
    }), str(tmp_path / "orders.parquet"))
    out = q_mktsegment_orders(str(tmp_path)).take_all()
    got = {r["c_mktsegment"]: (r["n_orders"], r["total_cents"]) for r in out}
    assert got == {"A": (2, 3000), "B": (1, 3000)}


def test_all_pairs_cosine_with_empty_blocks(ray_session):
    """Vectors that all hash to ONE block must not produce duplicate
    pairs from the off-diagonal groups whose partner blocks are empty."""
    import numpy as np

    import ray.data

    from aushape_ray.functions.ann import _mix_ids, all_pairs_cosine

    # find ids that share a block at n_blocks=4
    ids = [i for i in range(200)
           if int(_mix_ids(np.array([i], np.int64))[0] % 4) == 0][:3]
    assert len(ids) == 3
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([[1.0, 0.0]] * 3, pa.list_(pa.float64(), 2)),
    })
    out = all_pairs_cosine(ray.data.from_arrow(t), 0.9, n_blocks=4).take_all()
    pairs = [(r["vec_a"], r["vec_b"]) for r in out]
    assert sorted(pairs) == sorted(set(pairs))  # no duplicates
    assert len(pairs) == 3  # C(3,2) identical vectors


def test_nested_shards_with_same_basename_do_not_collide(ray_session, tmp_path):
    """Recursive shard discovery + relative-path keys: two nested shards
    named part-0.parquet must both survive resume with separate outputs
    and manifests."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aushape_ray.config import PipelineConfig
    from aushape_ray.state.manifest import find_shards, run_resumable, shard_key

    in_dir = tmp_path / "in"
    for sub, conv in (("shard-00", "c1"), ("shard-01", "c2")):
        d = in_dir / sub
        d.mkdir(parents=True)
        pq.write_table(pa.table({
            "conv_id": pa.array([conv] * 2, pa.string()),
            "turn_idx": pa.array([0, 1], pa.int32()),
            "role": pa.array(["user", "assistant"], pa.string()),
            "text": pa.array([f"node=h type=MSG m={conv}"] * 2, pa.string()),
            "tool": pa.array(["", ""], pa.string()),
            "ts": pa.array([1, 2], pa.timestamp("us")),
        }), str(d / "part-0.parquet"))

    files = find_shards(str(in_dir))
    assert len(files) == 2
    keys = {shard_key(f, str(in_dir)) for f in files}
    assert keys == {"shard-00__part-0.parquet", "shard-01__part-0.parquet"}

    out_dir = str(tmp_path / "out")
    res = run_resumable(str(in_dir), out_dir, PipelineConfig(num_parts=2))
    assert res["processed"] == 2
    assert sum(res["sink_counts"].values()) == 2  # one event per shard
    assert len(glob.glob(f"{out_dir}/shards/*/sink=*.parquet")) == 2
    # resume skips BOTH (no collision-induced reprocessing)
    res2 = run_resumable(str(in_dir), out_dir, PipelineConfig(num_parts=2))
    assert res2["processed"] == 0 and res2["skipped"] == 2
    assert "orphaned_shards" not in res2


def test_folded_syslog_rejected(ray_session, tmp_path):
    import ray.data

    from aushape_ray.foldout import FoldFormat
    from aushape_ray.pipelines.events_pipeline import write_jsonl_routed

    ds = ray.data.from_items([{"sink": "tool_events", "doc": "{}"}])
    with pytest.raises(ValueError, match="compact"):
        write_jsonl_routed(ds, str(tmp_path), fmt=FoldFormat(fold_level=4),
                           pri=86)


def test_doc_normalize_whitespace_class_matches_duckdb(tmp_path):
    """The explicit [ \\t\\n\\r\\f] class must digest identically in
    Python and DuckDB even for texts with Unicode whitespace / vertical
    tabs that Python's \\s would treat differently."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import sql_doc_normalize

    texts = ["a  b\tc", " lead trail ", "nb sp", "vert\x0btab",
             "mixed   line \t sep", "UPPER Case"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }), str(tmp_path / "documents.parquet"))

    import hashlib
    import re

    ws = re.compile(r"[ \t\n\r\f]+")
    want = {i: hashlib.md5(ws.sub(" ", t.lower()).strip().encode()).hexdigest()
            for i, t in enumerate(texts)}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp_path}/documents.parquet')")
    got = {int(r[0]): r[1] for r in con.sql(sql_doc_normalize()).fetchall()}
    assert got == want
