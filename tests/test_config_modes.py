"""Config-variant parity: actor-pool enrich and hash-shuffle exchange
produce identical results to the defaults."""

import pyarrow as pa
import pytest

import ray.data

from aushape_ray.config import PipelineConfig
from aushape_ray.pipelines.events_pipeline import build_events


@pytest.fixture(scope="module")
def expected(ray_session, tiny_transcripts, oracle_events):
    return {e["conv_id"]: e["doc"] for e in oracle_events}


def _docs(tb, cfg):
    rows = build_events(ray.data.from_arrow(tb), cfg).take_all()
    return {r["conv_id"]: r["doc"] for r in rows}


def test_actor_pool_enrich_mode(ray_session, tiny_transcripts, expected):
    cfg = PipelineConfig(num_parts=8, enrich_mode="actors",
                         enrich_concurrency=2)
    assert _docs(tiny_transcripts, cfg) == expected


def test_hash_shuffle_mode(ray_session, tiny_transcripts, expected):
    cfg = PipelineConfig(num_parts=8, shuffle="hash")
    assert _docs(tiny_transcripts, cfg) == expected


def test_cli_ray_init_kwargs_cluster_vs_local():
    from aushape_ray.__main__ import _ray_init_kwargs

    local = _ray_init_kwargs("local", 8)
    assert local["address"] == "local" and local["num_cpus"] == 8
    # under `ray job submit` RAY_ADDRESS points at the cluster: attach,
    # and never pass num_cpus (ray.init rejects it for existing clusters)
    attach = _ray_init_kwargs("ray://head:10001", 8)
    assert attach["address"] == "ray://head:10001"
    assert "num_cpus" not in attach
