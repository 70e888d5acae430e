"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in aushape_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: transcripts (generated from the BASELINE.json
    input_hint shape at the sf0.001 scale) -> parse -> enrich -> coalesce
    per conversation -> routed event rows."""
    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import events_for

    return events_for("/root/testdata/sf0.001", PipelineConfig(num_parts=8))


def queries() -> dict[str, Callable[[str], Any]]:
    from aushape_ray.pipelines.queries import build_registry

    qs, _ = build_registry()
    return qs


def oracle_sql() -> dict[str, str]:
    from aushape_ray.pipelines.queries import build_registry

    _, sql = build_registry()
    return sql
