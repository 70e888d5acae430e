"""Ray-Data-native audit-event shaping engine (aushape semantics, rebuilt).

Public surface:

    from aushape_ray import PipelineConfig, build_events, events_for
    from aushape_ray import StreamConverter          # conv.h-style embedding
    from aushape_ray.pipelines.events_pipeline import (
        events_contiguous, write_routed, write_jsonl_routed)
    from aushape_ray.state.manifest import run_resumable

Library code never calls ray.init(); the caller owns the session.
"""

from .config import PipelineConfig

__all__ = ["PipelineConfig", "StreamConverter", "build_events", "events_for"]


def __getattr__(name):  # lazy: keep bare import light (no ray import)
    if name == "StreamConverter":
        from .stream import StreamConverter

        return StreamConverter
    if name in ("build_events", "events_for"):
        from .pipelines import events_pipeline

        return getattr(events_pipeline, name)
    raise AttributeError(name)
