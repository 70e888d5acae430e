"""Property-based tests (SURVEY.md §5.4): random execve slicings must
reassemble to the original argv; random trim caps keep the envelope intact
and respect the cap; parse round-trips arbitrary token soup."""

import json

from hypothesis import given, settings, strategies as st

from aushape_ray.collectors import (
    ExecveCollector,
    doc_size,
    trim_doc,
)
from aushape_ray.grammar import TOKEN_RE, interpret_field, strip_quotes
from aushape_ray.oracle import parse_text

argv_st = st.lists(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
            min_size=0, max_size=40),
    min_size=1, max_size=6)


@given(argv=argv_st, data=st.data())
@settings(max_examples=150, deadline=None)
def test_execve_random_slicing_reassembles(argv, data):
    """Slice each arg into 1..4 hex pieces at random byte cuts (respecting
    utf-8 boundaries via encode-then-split on code points) and feed records
    in order: end() must return the original argv
    (lib/execve_coll.c:364-377 accounting)."""
    c = ExecveCollector()
    c.add([("argc", str(len(argv)), str(len(argv)))])
    for i, arg in enumerate(argv):
        if data.draw(st.booleans(), label=f"whole_{i}"):
            c.add([(f"a{i}", arg, arg)])
            continue
        n_cuts = data.draw(st.integers(1, 4), label=f"ncuts_{i}")
        cut_points = sorted(data.draw(
            st.lists(st.integers(0, len(arg)), min_size=n_cuts - 1,
                     max_size=n_cuts - 1), label=f"cuts_{i}"))
        pieces, prev = [], 0
        for cp in cut_points + [len(arg)]:
            pieces.append(arg[prev:cp])
            prev = cp
        blen = len(arg.encode("utf-8"))
        c.add([(f"a{i}_len", str(blen), str(blen))])
        for j, piece in enumerate(pieces):
            hexv = piece.encode("utf-8").hex()
            c.add([(f"a{i}[{j}]", hexv, interpret_field(f"a{i}[{j}]", hexv))])
    out = c.end()
    # slice length accounting is in BYTES of the decoded value
    assert out == argv


doc_st = st.fixed_dictionaries({
    "serial": st.text(min_size=1, max_size=10),
    "time": st.just("2026-01-01T00:00:00.000"),
    "text": st.lists(st.text(max_size=80), max_size=30),
    "data": st.dictionaries(
        st.sampled_from(["msg", "avc", "obj_pid"]),
        st.lists(st.dictionaries(st.sampled_from(["a", "b"]),
                                 st.lists(st.text(max_size=20), min_size=1,
                                          max_size=2),
                                 max_size=2), max_size=20),
        max_size=3),
})


@given(doc=doc_st, cap=st.integers(1024, 8192))
@settings(max_examples=100, deadline=None)
def test_trim_respects_cap_and_keeps_envelope(doc, cap):
    import copy

    orig = copy.deepcopy(doc)
    out = trim_doc(copy.deepcopy(doc), cap)  # trim mutates nested lists
    assert doc_size(out) <= max(1024, cap)
    assert out["serial"] == orig["serial"]
    assert out["time"] == orig["time"]
    # trimmed text is a prefix of the original (tail-drop only)
    kept = out.get("text", [])
    assert kept == orig["text"][: len(kept)]


token_soup = st.text(
    alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
    max_size=200)


@given(text=token_soup)
@settings(max_examples=300, deadline=None)
def test_parse_is_total_and_consistent(text):
    """parse_text never raises and agrees with a direct regex scan."""
    node, kind, fields = parse_text(text)
    toks = [(m.group(1), strip_quotes(m.group(2)))
            for m in TOKEN_RE.finditer(text)
            if m.group(1) not in ("node", "type")]
    assert [(k, r) for k, r, _ in fields] == toks
    for k, r, i in fields:
        assert i == interpret_field(k, r)
    json.dumps({"fields": [list(f) for f in fields]}, ensure_ascii=False)


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(
    alphabet="ab=<> é\n\"", min_size=0, max_size=24), max_size=12))
def test_template_column_matches_scalar(texts):
    """The Arrow-vectorized template mask == the per-row scalar form for
    arbitrary token soup (equals signs, unicode, newlines, quotes)."""
    import pyarrow as pa

    from aushape_ray.pipelines.queries import _template_column

    def scalar(text):
        out = []
        for tok in text.split(" "):
            if "=" not in tok:
                continue
            if tok.startswith("type="):
                out.append(tok)
            else:
                out.append(tok[: tok.index("=") + 1] + "<V>")
        return " ".join(out)

    got = _template_column(pa.array(texts, pa.string())).to_pylist()
    assert got == [scalar(t) for t in texts]
