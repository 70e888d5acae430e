"""Pipeline configuration (S5 analogue — /root/reference/lib/conf.c:175-415).

Maps the reference CLI surface onto Ray Data execution knobs:

- with_text / with_norm / max_event_size: document shaping options
  (reference --with-text, --with-norm, --max-event-size; min cap 1024 per
  include/aushape/format.h:30-31).
- events_per_doc -> rows per output file (document batching A1,
  lib/conv.c:84-172, becomes write_parquet file sizing).
- num_parts: hash partitions for the one conv_id shuffle.
- enrich_concurrency / batch_size: actor-pool sizing for the enrich stage.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    with_text: bool = True
    with_norm: bool = False
    max_event_size: int | None = None  # bytes; None = unlimited; min 1024
    events_per_doc: int = 50_000       # rows per output parquet file
    num_parts: int = 64                # conv_id hash partitions (the shuffle)
    batch_size: int = 8_192            # parse/enrich batch size
    enrich_concurrency: int | tuple[int, int] = (2, 8)
    # "tasks": stateless map_batches with a per-worker-process cached
    # dictionary (fast default — workers are reused, so state is still
    # built once per process).  "actors": explicit actor pool (the shape a
    # multi-node deployment uses when dictionaries are ray.put broadcasts).
    enrich_mode: str = "tasks"
    # exchange implementation for the conv_id groupby: "sort" (default,
    # faster at measured scales) or "hash" (aggregator actors; capped to
    # cluster CPUs/2 — see events_pipeline._configure_shuffle).
    shuffle: str = "sort"
    # salted-key skew handling (SURVEY.md §4): conversations with more than
    # salt_threshold turns are split into n_salts contiguous turn ranges,
    # partially assembled in parallel, and merged in a second tiny groupby.
    # None = off (a hot conversation is confined to one partition task).
    salt_threshold: int | None = None
    n_salts: int = 8
    # where tokenization+enrichment runs on the shuffle path: "pre" (before
    # the exchange; token lists ship through the shuffle) or "post"
    # (project-early-parse-late: the exchange carries only the raw turn
    # projection, ~45% fewer bytes; parse runs inside the assemble stage).
    parse_stage: str = "post"

    def __post_init__(self) -> None:
        if self.max_event_size is not None and self.max_event_size < 1024:
            object.__setattr__(self, "max_event_size", 1024)
        if self.parse_stage not in ("pre", "post"):
            raise ValueError(f"parse_stage must be pre|post, got {self.parse_stage!r}")
        if self.enrich_mode not in ("tasks", "actors"):
            raise ValueError(f"enrich_mode must be tasks|actors, got {self.enrich_mode!r}")
        if self.shuffle not in ("sort", "hash"):
            raise ValueError(f"shuffle must be sort|hash, got {self.shuffle!r}")
