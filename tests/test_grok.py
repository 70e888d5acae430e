"""functions/grok.py: pattern expansion, the three unmatched-row modes,
typed casts, and error isolation (null text, garbage rows)."""

import numpy as np
import pyarrow as pa
import pytest

from aushape_ray.functions.grok import PATTERNS, compile_grok, grok_extract


def test_compile_expands_refs():
    rx = compile_grok("uid=%{INT:uid} name=%{WORD:name}")
    assert rx == r"uid=(?P<uid>[+-]?[0-9]+) name=(?P<name>[A-Za-z0-9_]+)"
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")
    with pytest.raises(ValueError):
        compile_grok("no captures here")
    # raw named captures pass through untouched
    assert compile_grok(r"(?P<k>[a-z]+)") == r"(?P<k>[a-z]+)"


def _ds():
    import ray.data

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["uid=10 x", "garbage", None, "uid=-3 y"],
                         pa.string()),
    })
    return ray.data.from_arrow(t)


def test_modes(ray_session):
    pat = "uid=%{INT:uid}"
    drop = grok_extract(_ds(), pat, types={"uid": pa.int64()}).to_pandas()
    assert list(drop["id"]) == [1, 4]
    assert list(drop["uid"]) == [10, -3]
    assert drop["uid"].dtype == np.int64

    nul = grok_extract(_ds(), pat, how="null",
                       types={"uid": pa.int64()}).to_pandas()
    assert len(nul) == 4
    assert nul["uid"].isna().tolist() == [False, True, True, False]

    tag = grok_extract(_ds(), pat, how="tag").to_pandas()
    assert tag["_grokfail"].tolist() == [False, True, True, False]
    assert tag["uid"].tolist()[0] == "10"  # untyped stays string

    with pytest.raises(ValueError):
        grok_extract(_ds(), pat, how="bogus")


def test_primitives_cover_quoted_and_ip(ray_session):
    import ray.data

    t = pa.table({"text": pa.array(
        ['src=10.0.0.1 msg="hello world"', "src=bad msg=none"])})
    out = grok_extract(
        ray.data.from_arrow(t),
        'src=%{IP:src} msg=%{QUOTEDSTRING:msg}').to_pandas()
    assert len(out) == 1
    assert out["src"][0] == "10.0.0.1"
    assert out["msg"][0] == '"hello world"'
    assert set(PATTERNS) >= {"INT", "WORD", "DATA", "GREEDYDATA", "HEX"}


def test_grok_route_first_match_order(ray_session):
    import ray.data

    from aushape_ray.functions.grok import grok_route

    t = pa.table({"text": pa.array([
        "type=SYSCALL type=MSG x",  # matches both -> first pattern wins
        "type=MSG hello",
        "nothing here",
        None,
    ])})
    out = grok_route(ray.data.from_arrow(t), {
        "syscall": "type=SYSCALL ", "msg": "type=MSG "}).to_pandas()
    assert out["grok_route"].tolist() == ["syscall", "msg", "", ""]


def test_grok_route_expands_refs(ray_session):
    import ray.data

    from aushape_ray.functions.grok import grok_route

    t = pa.table({"text": pa.array(["uid=42 ok", "uid=bad"])})
    out = grok_route(ray.data.from_arrow(t),
                     {"num": "uid=%{INT:uid} "}).to_pandas()
    assert out["grok_route"].tolist() == ["num", ""]
