"""Differential sweep: pipeline == oracle on corpora from other seeds
(different RNG paths exercise different structural-case mixes)."""

import pytest

import ray.data

from aushape_ray.config import PipelineConfig
from aushape_ray.fixtures import generate_transcripts
from aushape_ray.oracle import assemble_events


@pytest.mark.parametrize("seed", [1, 2, 99])
def test_pipeline_matches_oracle_other_seeds(ray_session, seed):
    from aushape_ray.pipelines.events_pipeline import build_events

    tb = generate_transcripts(150, seed=seed)
    oracle = {e["conv_id"]: e for e in assemble_events(tb)}
    rows = build_events(ray.data.from_arrow(tb),
                        PipelineConfig(num_parts=8)).take_all()
    assert len(rows) == len(oracle)
    for r in rows:
        e = oracle[r["conv_id"]]
        assert r["doc"] == e["doc"], (seed, r["conv_id"])
        assert r["sink"] == e["sink"]
