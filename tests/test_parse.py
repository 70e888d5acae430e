"""Parse stage (vectorized) vs oracle per-turn parse — field equality."""

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from aushape_ray.grammar import PY_WHITESPACE
from aushape_ray.oracle import parse_text
from aushape_ray.stages.parse import parse_batch, parse_batch_reference


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


def test_py_whitespace_literal_is_exactly_re_s():
    """PY_WHITESPACE (grammar.py) must equal the full set of str chars
    Python's re \\s matches — the TOKEN_RE2 port is only exact under this."""
    want = {ch for ch in map(chr, range(0x11000)) if re.match(r"\s", ch)}
    assert set(PY_WHITESPACE) == want
    assert len(PY_WHITESPACE) == len(want)  # no duplicates


def _assert_parse_equal(texts):
    batch = pa.table({"text": pa.array(texts, pa.string())})
    a, b = parse_batch(batch), parse_batch_reference(batch)
    for col in ("node", "kind", "tok_keys", "tok_vals"):
        assert a.column(col).to_pylist() == b.column(col).to_pylist(), col


def test_vectorized_parse_adversarial_parity():
    """Hand-picked lookbehind/quote/whitespace edge cases: the Rust-regex
    TOKEN_RE2 scan must match the Python TOKEN_RE finditer walk."""
    _assert_parse_equal([
        'node=h1 type=SYSCALL uid=0 exe="/usr/bin/bash" key=(null)',
        '1abc=d foo http://k=v',          # lookbehind: no match mid-word
        'a="unterminated b=c',            # bare fallback when quote unclosed
        'a="" b="q" c="x"y" d==e',        # empty/adjacent/degenerate quotes
        'k=v"inner w=z" t=u',             # tokens not re-found inside values
        'a=b\xa0c=d e=f\x1fg=h',          # unicode NBSP + \x1f separators
        'a=b  \t c=d\ne=f',               # multi-ws + newline inside a row
        'node=n1 node=n2 type=A type=B',  # first-node / last-type rules
        '', ' ', '=', 'trailing=', 'x' * 100 + '=v tail=1',
        'key_' + 'a' * 64 + '=v over64',  # key-length cap
    ])


# tokens + junk, joined by whitespace of every Python \s flavor
_tok = st.one_of(
    st.sampled_from(['uid=0', 'exe="/bin/sh"', 'x="a b"', '"q"=z', 'k==v',
                     'a="', 'w="x', 'plain', '=v', 'a1[3]=ff', 'node=zz',
                     'type=QQ', 'a0=4142']),
    st.text(alphabet='abZ_19[]=". \x1f\n\xa0', min_size=1, max_size=12),
)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.lists(_tok, max_size=8).map(' '.join), max_size=6),
       st.sampled_from(list(PY_WHITESPACE)))
def test_vectorized_parse_hypothesis_parity(rows, sep):
    _assert_parse_equal([sep.join(r.split(' ')) for r in rows] + rows)
