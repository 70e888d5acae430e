"""The shuffle-free contiguous fast path must equal the shuffle path and
the oracle exactly (same docs, same sinks) on shard-aligned input."""

import pyarrow.parquet as pq
import pytest

from aushape_ray.config import PipelineConfig
from aushape_ray.fixtures import ensure_transcripts
from aushape_ray.oracle import assemble_events
from aushape_ray.pipelines.events_pipeline import events_contiguous, events_for

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_sf001():
    import glob

    path = ensure_transcripts(SF)
    tables = [pq.read_table(f) for f in sorted(glob.glob(f"{path}/*.parquet"))]
    import pyarrow as pa

    return assemble_events(pa.concat_tables(tables))


def test_contiguous_equals_oracle(ray_session, oracle_sf001):
    rows = events_contiguous(SF, PipelineConfig()).take_all()
    exp = {e["conv_id"]: e for e in oracle_sf001}
    assert len(rows) == len(exp)
    for r in rows:
        e = exp[r["conv_id"]]
        assert r["doc"] == e["doc"], r["conv_id"]
        assert r["sink"] == e["sink"], r["conv_id"]


def test_contiguous_equals_shuffle_path(ray_session):
    cfg = PipelineConfig(num_parts=8)
    a = {r["conv_id"]: r["doc"] for r in events_contiguous(SF, cfg).take_all()}
    b = {r["conv_id"]: r["doc"] for r in events_for(SF, cfg).take_all()}
    assert a == b
