"""Per-row error isolation: bad rows latch into error events, never fail a
task (lib/conv_buf.c:627-648 ported semantics + null hardening)."""

import pyarrow as pa
import pytest

import ray.data

from aushape_ray.config import PipelineConfig
from aushape_ray.pipelines.events_pipeline import build_events


@pytest.fixture()
def dirty_table():
    return pa.table({
        "conv_id": pa.array(["g1", "g1", "g2", "g3"], pa.string()),
        "turn_idx": pa.array([0, 1, 0, 0], pa.int32()),
        "role": pa.array(["user", "tool", None, "assistant"], pa.string()),
        "text": pa.array(
            ["%%% binary\x01garbage ===", None, "", "type=MSG ok len=2"],
            pa.string()),
        "tool": pa.array([None, "shell", None, None], pa.string()),
        "ts": pa.array([1, 2, 3, 4], pa.timestamp("us")),
    })


def test_nulls_and_garbage_never_fail_the_task(ray_session, dirty_table):
    rows = build_events(
        ray.data.from_arrow(dirty_table), PipelineConfig(num_parts=4)
    ).take_all()
    by_id = {r["conv_id"]: r for r in rows}
    # two unparseable (UNKNOWN-kind) turns in one conv = repeated unique kind
    # -> error event with full raw text retained
    assert by_id["g1"]["sink"] == "error_events"
    assert by_id["g1"]["error"] == "repeated record kind UNKNOWN"
    assert list(by_id["g1"]["text"]) == ["%%% binary\x01garbage ===", ""]
    assert by_id["g2"]["sink"] == "dialog_events"
    assert by_id["g3"]["error"] is None


def test_oracle_handles_nulls_identically(dirty_table):
    from aushape_ray.oracle import assemble_events

    ev = {e["conv_id"]: e for e in assemble_events(dirty_table)}
    assert ev["g1"]["error"] == "repeated record kind UNKNOWN"
    assert ev["g1"]["text"] == ["%%% binary\x01garbage ===", ""]
    assert ev["g2"]["sink"] == "dialog_events"
