"""The flagship parse → enrich → coalesce → route → aggregate pipeline.

Ray-Data-first composition (SURVEY.md §3 rebuild lifecycle):

    read_parquet(transcripts)                       # columns pruned
      -> map_batches(parse_batch, pyarrow, 0-copy)  # stateless tasks
      -> map_batches(Enricher, concurrency=pool)    # actor pool
      -> add_part (hash conv_id % P)                # tiny stateless map
      -> groupby("part").map_groups(Assemble)       # THE one shuffle
      -> [sink routing column is on every event row]
      -> per-sink write_parquet + groupby(sink).count()

Never calls ray.init(); the caller owns the session.
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..fixtures import ensure_transcripts
from ..grammar import SINKS
from ..stages.assemble import AssemblePartition, add_part
from ..stages.enrich import Enricher
from ..stages.parse import parse_batch

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(sf_dir: str) -> "ray.data.Dataset":
    path = ensure_transcripts(sf_dir)
    return ray.data.read_parquet(path, columns=TRANSCRIPT_COLUMNS)


def build_events(ds: "ray.data.Dataset",
                 cfg: PipelineConfig = PipelineConfig()) -> "ray.data.Dataset":
    """Transcript rows -> assembled event rows (EVENT_SCHEMA)."""
    parsed = ds.map_batches(
        parse_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    enriched = parsed.map_batches(
        Enricher, batch_format="pyarrow", batch_size=cfg.batch_size,
        concurrency=cfg.enrich_concurrency,
    )
    parted = enriched.map_batches(
        lambda b: add_part(b, cfg.num_parts),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    )
    events = parted.groupby("part").map_groups(
        AssemblePartition(
            with_text=cfg.with_text, with_norm=cfg.with_norm,
            max_event_size=cfg.max_event_size,
        ),
        batch_format="pyarrow",
    )
    return events


def events_for(sf_dir: str, cfg: PipelineConfig = PipelineConfig()) -> "ray.data.Dataset":
    return build_events(read_transcripts(sf_dir), cfg)


def sink_counts(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-sink aggregate counts (A2 analogue — the north-rule check)."""
    return events.groupby("sink").count()


def write_routed(events: "ray.data.Dataset", out_dir: str,
                 cfg: PipelineConfig = PipelineConfig()) -> dict[str, int]:
    """Fan-out write: one parquet directory per sink (S2-S4 analogue).

    ONE execution of the upstream pipeline: a hive-partitioned write on the
    `sink` column produces `out_dir/sink=<name>/...` directories (distinct
    directories = resumable units).  Per-sink counts are then read from
    parquet footers only — no data scan, no re-execution.
    """
    events.write_parquet(
        out_dir, partition_cols=["sink"], min_rows_per_file=cfg.events_per_doc,
    )
    import glob

    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for sink in SINKS:
        n = 0
        for f in glob.glob(f"{out_dir}/sink={sink}/*.parquet"):
            n += pq.ParquetFile(f).metadata.num_rows
        if n:
            counts[sink] = n
    return counts
