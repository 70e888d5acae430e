"""Parse stage (vectorized) vs oracle per-turn parse — field equality."""

import pyarrow as pa

from aushape_ray.oracle import parse_text
from aushape_ray.stages.parse import parse_batch


def test_parse_batch_matches_oracle(tiny_transcripts):
    out = parse_batch(tiny_transcripts)
    texts = out.column("text").to_pylist()
    nodes = out.column("node").to_pylist()
    kinds = out.column("kind").to_pylist()
    keys = out.column("tok_keys").to_pylist()
    vals = out.column("tok_vals").to_pylist()
    for i, t in enumerate(texts):
        node, kind, fields = parse_text(t)
        assert nodes[i] == node, (i, t)
        assert kinds[i] == kind, (i, t)
        assert keys[i] == [f[0] for f in fields], (i, t)
        assert vals[i] == [f[1] for f in fields], (i, t)


def test_parse_empty_batch():
    empty = pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "role": pa.array([], pa.string()),
        "text": pa.array([], pa.string()),
        "tool": pa.array([], pa.string()),
        "ts": pa.array([], pa.timestamp("us")),
    })
    out = parse_batch(empty)
    assert out.num_rows == 0
    assert "tok_keys" in out.column_names


def test_parse_edge_tokens():
    rows = [
        'node=h1 type=MSG plain words len=5',
        'type=EXECVE argc=2 a0="ls -la" a1_len=4 a1[0]=68656c6c',
        'no tokens at all',
        'type=MSG quote:" unbalanced "x y" then k=v',
        'a= b=1',  # dangling empty value is not a token
    ]
    batch = pa.table({"text": pa.array(rows, pa.string())})
    out = parse_batch(batch)
    assert out.column("kind").to_pylist() == ["MSG", "EXECVE", "UNKNOWN", "MSG", "UNKNOWN"]
    assert out.column("tok_keys").to_pylist()[1] == ["argc", "a0", "a1_len", "a1[0]"]
    assert out.column("tok_vals").to_pylist()[1] == ["2", "ls -la", "4", "68656c6c"]
    assert out.column("tok_keys").to_pylist()[4] == ["b"]
    # every row parses identically to the oracle
    for i, t in enumerate(rows):
        node, kind, fields = parse_text(t)
        assert out.column("kind").to_pylist()[i] == kind
        assert out.column("tok_keys").to_pylist()[i] == [f[0] for f in fields]
