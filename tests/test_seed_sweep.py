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


@pytest.mark.parametrize("seed", [3, 42])
def test_transcript_analytics_match_duckdb_other_seeds(ray_session, seed,
                                                       tmp_path):
    """The round-2 transcript analytics (kind-transition bigrams, global
    field-key histogram) must match their DuckDB oracles on corpora from
    OTHER generator seeds, not just the driver's fixture."""
    import duckdb
    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import (
        q_t_field_histogram,
        q_t_kind_bigrams,
        sql_t_field_histogram,
        sql_t_kind_bigrams,
    )

    tb = generate_transcripts(200, seed=seed)
    d = tmp_path / "transcripts_small"
    d.mkdir()
    pq.write_table(tb, str(d / "part-0.parquet"))
    # queries resolve the corpus via ensure_transcripts(sf_dir) ->
    # <cache>/<basename>; point them at tmp by making the layout match
    sf_dir = str(tmp_path)

    import aushape_ray.fixtures as fx

    orig = fx.ensure_transcripts
    try:
        fx.ensure_transcripts = lambda _sf: str(d)
        import aushape_ray.pipelines.events_pipeline as ep

        ep_orig = ep.ensure_transcripts
        ep.ensure_transcripts = lambda _sf: str(d)
        try:
            got_b = q_t_kind_bigrams(sf_dir).to_pandas()
            got_h = q_t_field_histogram(sf_dir).to_pandas()
        finally:
            ep.ensure_transcripts = ep_orig
    finally:
        fx.ensure_transcripts = orig

    con = duckdb.connect()
    path = str(d / "*.parquet")
    exp_b = con.sql(sql_t_kind_bigrams(path)).df()
    exp_h = con.sql(sql_t_field_histogram(path)).df()

    def canon(df, cols):
        return df.sort_values(cols, ignore_index=True)

    got_b = canon(got_b, ["from_kind", "to_kind"])
    exp_b = canon(exp_b, ["from_kind", "to_kind"])
    assert got_b.equals(exp_b), seed
    got_h = canon(got_h, ["key"])
    exp_h = canon(exp_h, ["key"])
    assert got_h.equals(exp_h), seed


@pytest.mark.parametrize("seed", [7, 55])
def test_rawlog_roundtrip_other_seeds(ray_session, seed, tmp_path):
    """Raw-log write -> read -> distributed pipeline == oracle over the
    same parsed rows, on corpora from other generator seeds (control
    chars, hot conversations, oversized texts all vary by seed)."""
    import pyarrow as pa

    from aushape_ray.pipelines.events_pipeline import (build_events,
                                                       sink_counts)
    from aushape_ray.oracle import sink_counts as osc
    from aushape_ray.sources.rawlog import read_audit_log, write_audit_log

    tb = generate_transcripts(120, seed=seed).sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")])
    f = str(tmp_path / "audit.log")
    assert write_audit_log(tb, f, sanitize=True) == tb.num_rows

    parsed = pa.Table.from_pylist(read_audit_log([f]).take_all())
    events = build_events(read_audit_log([f]), PipelineConfig(num_parts=8))
    got = {r["sink"]: r["count()"] for r in sink_counts(events).take_all()}
    want = osc(assemble_events(parsed))
    assert got == want, seed
