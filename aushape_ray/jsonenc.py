"""Compact JSON document encoder shared by the assembler, the
single-process oracle and the streaming converter.

Contract: byte-identical to
``json.dumps(obj, ensure_ascii=False, separators=(",", ":"))`` over the
event-document value space — str / int64-range int / None / bool / dict
/ list.  Floats never occur in event docs (every audit field renders as
a string or an int, collectors._finalize_data; the M7 escaping parity of
lib/gbuf.c:344-413 is over strings), which is the one type whose
formatting could diverge between backends (1e+300 vs 1e300).

orjson (present in this container) meets the contract for that value
space and encodes several times faster than the stdlib C encoder, which
matters because every finished event is serialized twice — once by
trim_doc's size check (collectors.doc_size) and once for the doc column
(stages/assemble.finish_event).  Anything orjson cannot take (ints
beyond the 64-bit range from garbage input, exotic key types) falls back
to the stdlib encoder, whose output for such values IS the contract by
definition.  tests/test_round5.py enforces corpus-wide byte parity
between the two backends on the fixture corpus plus adversarial cases.
"""

from __future__ import annotations

import json

_STD = json.JSONEncoder(ensure_ascii=False, separators=(",", ":")).encode

try:
    import orjson as _orjson
except ImportError:  # stdlib-only environment
    _orjson = None


if _orjson is not None:
    _odumps = _orjson.dumps

    def encode_doc_bytes(obj) -> bytes:
        """UTF-8 bytes of the compact JSON doc (fast path: orjson)."""
        try:
            return _odumps(obj)
        except TypeError:
            return _STD(obj).encode("utf-8")

    def encode_doc(obj) -> str:
        """Compact JSON doc string (fast path: orjson)."""
        try:
            return _odumps(obj).decode("utf-8")
        except TypeError:
            return _STD(obj)
else:
    def encode_doc_bytes(obj) -> bytes:
        """UTF-8 bytes of the compact JSON doc (stdlib backend)."""
        return _STD(obj).encode("utf-8")

    def encode_doc(obj) -> str:
        """Compact JSON doc string (stdlib backend)."""
        return _STD(obj)
