"""Shared grammar constants for the transcript → event pipeline.

This is the single source of truth for the `k=v` token grammar, the record
kind taxonomy (which mirrors the reference's disp_coll routing table,
/root/reference/lib/conv_buf.c:60-96), and the field-interpretation
dictionaries (analogue of auparse field interpretation consumed at
/root/reference/lib/field.c:104-130).

Both the Ray pipeline (aushape_ray.stages.*) and the independent
single-process oracle (aushape_ray.oracle) import ONLY these constants —
their logic is implemented separately so tests are a real cross-check.
"""

from __future__ import annotations

import re

# One audit-style token: key=value where value is a quoted string or a bare
# non-space run that cannot span a newline (so the batched joined-string
# scan in stages/parse.py is equivalent to per-row parsing even with
# unbalanced quotes); the key must start a word ((?<!\S): preceded by
# whitespace or start-of-line).  Key may contain [] for execve slice tokens like a1[0].
# The lookbehind keeps Python's backtracking engine O(1) per character on
# non-token runs (e.g. a 256 KiB single-word text) and the {0,63} bound caps
# the one attempt per word start.  RE2 (DuckDB) has no lookbehind, so
# TOKEN_REGEX_SQL drops it — identical semantics on space-separated audit
# records (the only place the SQL form is applied: EXECVE-turn token
# explosion in the sink-count oracle).
TOKEN_RE = re.compile(r'(?<!\S)([A-Za-z_][A-Za-z0-9_\[\]]{0,63})=("[^"\n]*"|\S+)')
TOKEN_REGEX_SQL = r'([A-Za-z_][A-Za-z0-9_\[\]]{0,63})=("[^"\n]*"|\S+)'

# The exact character set Python's re module matches for `\s` on str
# (str.isspace), spelled out so the lookbehind-free RE2/Rust-regex port of
# TOKEN_RE below is character-for-character equivalent (RE2-family `\s` is
# ASCII-only and its unicode White_Space class would still miss
# \x1c-\x1f/\x85).  tests/test_parse.py asserts this literal equals a full
# scan of `re.match(r"\s", chr(c))`.
PY_WHITESPACE = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009"
    "\u200a\u2028\u2029\u202f\u205f\u3000"
)

# TOKEN_RE for backtracking-free engines (polars/Rust regex, RE2): the
# zero-width (?<!\S) lookbehind becomes a consumed one-char separator
# alternative.  Equivalent scan-by-scan because no token value or key can
# contain (or end adjacent to) a whitespace character, so the consumed
# separator can never belong to another match; group 0 therefore carries at
# most one leading whitespace char, which stages/parse.py strips.  Verified
# exhaustively against TOKEN_RE by the hypothesis/adversarial parity test.
TOKEN_RE2 = (
    "(?:^|[" + PY_WHITESPACE + "])"
    r"([A-Za-z_][A-Za-z0-9_\[\]]{0,63})="
    '("[^"\n]*"|[^' + PY_WHITESPACE + "]+)"
)

# Pseudo-fields extracted into the envelope, never into the record body
# (reference skip-list: lib/record.c:45-46).
PSEUDO_FIELDS = ("node", "type")

# --- record kind routing table (disp_coll analogue) -----------------------
# kind -> collector class name.  Anything not listed routes to "uniq"
# (catch-all, repeated kind within one conversation is an error,
# lib/uniq_coll.c:151-153).
EXECVE_KIND = "EXECVE"
PATH_KIND = "PATH"
REP_KINDS = ("MSG", "AVC", "OBJ_PID", "NETFILTER_CFG")  # rep_coll analogue
DROP_KINDS = ("EOE",)                                   # drop_coll analogue
UNIQUE_KINDS = ("LOGIN", "SUMMARY", "CONFIG", "SYSCALL", "CWD")  # uniq_coll

PATH_MAX_ITEM = 255  # lib/path_coll.c slot ceiling

# --- field interpretation dictionaries (auparse interpret analogue) -------
SYSCALL_NAMES = {
    "0": "read", "1": "write", "2": "open", "3": "close", "39": "getpid",
    "41": "socket", "42": "connect", "57": "fork", "59": "execve",
    "62": "kill",
}
# keys whose numeric value maps to user_<n> / group_<n>
UID_KEYS = ("uid", "auid", "euid")
GID_KEYS = ("gid",)
# keys whose value is hex-encoded utf-8 needing decode; execve slice tokens
# (a<N>[<J>]) are always hex too.
HEX_KEYS = ("proctitle", "data")
SLICE_RE = re.compile(r"^a(\d+)\[(\d+)\]$")
ARG_RE = re.compile(r"^a(\d+)$")
ARG_LEN_RE = re.compile(r"^a(\d+)_len$")


def interpret_field(key: str, raw: str) -> str:
    """Interpreted value for one field (may equal raw).

    `raw` is the token value with surrounding quotes already stripped.
    Mirrors the per-type switch of the reference at lib/field.c:112-130:
    numeric ids -> names, hex -> decoded text, everything else unchanged.
    """
    if key in UID_KEYS:
        return f"user_{raw}"
    if key in GID_KEYS:
        return f"group_{raw}"
    if key == "syscall":
        return SYSCALL_NAMES.get(raw, raw)
    if key == "exit":
        return "success" if raw == "0" else f"errno_{raw}"
    if key in HEX_KEYS or SLICE_RE.match(key):
        try:
            return bytes.fromhex(raw).decode("utf-8")
        except (ValueError, UnicodeDecodeError):
            return raw
    return raw


def strip_quotes(v: str) -> str:
    if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        return v[1:-1]
    return v


# --- role / tool taxonomies (broadcast small-side enrich tables) ----------
ROLE_TAXONOMY = {
    # role -> (role_kind, role_rank)
    "user": ("human", 0),
    "assistant": ("model", 1),
    "system": ("control", 2),
    "tool": ("machine", 3),
}
TOOL_TAXONOMY = {
    # tool -> (tool_family, is_stateful)
    "shell": ("exec", True),
    "python": ("exec", True),
    "browser": ("web", True),
    "search": ("web", False),
    "editor": ("fs", True),
    "reader": ("fs", False),
}

# --- sinks (fan-out routing, S2-S4 analogue) ------------------------------
SINK_ERROR = "error_events"
SINK_TOOL = "tool_events"
SINK_DIALOG = "dialog_events"
SINKS = (SINK_ERROR, SINK_TOOL, SINK_DIALOG)

# Text-array separator used by envelope-equality SQL oracles; the generator
# guarantees it never appears inside a turn's text.
TEXT_SEP = "\x1f"
