"""Per-conversation record coalescers — the collector framework.

Pure Python, no Ray: used by BOTH the single-process oracle
(aushape_ray.oracle) and the distributed assemble stage
(aushape_ray.stages.assemble), so the distributed path is cross-checked
for shuffle/ordering/batching behaviour while semantics live in one place.

Mirrors the reference's collector vtable + state table
(/root/reference/include/aushape/coll.h:20-43, lib/coll.c:24-160):

- ExecveCollector  <- lib/execve_coll.c:431-577 (argv reassembly, slice
  length accounting :364-377, completeness check :533-536)
- PathCollector    <- lib/path_coll.c:77-260 (slot by `item`, gapless check)
- RepCollector     <- lib/rep_coll.c:90-228 (repeated records -> array)
- UniqCollector    <- lib/uniq_coll.c:135-168 (repeated kind is an error)
- drop kinds       <- lib/drop_coll.c:27-34 (handled by the dispatcher)
- EventAssembler   <- lib/conv_buf.c:355-709 (error latch :549-568, error
  node :627-648, drop-empty :570-574)

A "field" reaching a collector is (key, raw, interpreted) with quotes
already stripped from raw; the rendered field value is `[interpreted]` when
interpreted == raw else `[interpreted, raw]` (lib/field.c:116-130,
aushape.schema.json:5-13).
"""

from __future__ import annotations

from typing import Iterable

from .jsonenc import encode_doc_bytes

from .grammar import (
    ARG_LEN_RE,
    ARG_RE,
    DROP_KINDS,
    EXECVE_KIND,
    PATH_KIND,
    PATH_MAX_ITEM,
    REP_KINDS,
    SINK_DIALOG,
    SINK_ERROR,
    SINK_TOOL,
    SLICE_RE,
)

Field = tuple[str, str, str]  # (key, raw, interpreted)


class CollectError(Exception):
    """A per-conversation semantic violation (latches, never fails a task)."""


def _to_int(key: str, raw: str) -> int:
    """Numeric field parse that latches instead of crashing the task."""
    try:
        return int(raw)
    except (ValueError, TypeError):
        raise CollectError(f"invalid integer for {key}: {raw!r}") from None


def _to_hex_bytes(key: str, raw: str) -> bytes:
    try:
        return bytes.fromhex(raw)
    except (ValueError, TypeError):
        raise CollectError(f"invalid hex for {key}: {raw!r}") from None


def render_fields(fields: Iterable[Field]) -> dict:
    out = {}
    for key, raw, interp in fields:
        out[key] = [interp] if interp == raw else [interp, raw]
    return out


class ExecveCollector:
    """Reassemble argv split across EXECVE records."""

    def __init__(self) -> None:
        self.argc: int | None = None
        self.args: dict[int, str] = {}
        self.slices: dict[int, dict[int, bytes]] = {}  # RAW bytes per slice
        self.lens: dict[int, int] = {}
        self.seen = False

    def _check_idx(self, i: int) -> None:
        if self.argc is not None and i >= self.argc:
            raise CollectError(f"execve: arg index {i} out of range")

    def add(self, fields: Iterable[Field]) -> None:
        self.seen = True
        for key, raw, interp in fields:
            if key == "argc":
                if self.argc is not None:
                    raise CollectError("execve: duplicate argc")
                self.argc = _to_int("argc", raw)
                continue
            m = ARG_RE.match(key)
            if m:
                i = int(m.group(1))
                self._check_idx(i)
                self.args[i] = interp
                continue
            m = ARG_LEN_RE.match(key)
            if m:
                i = int(m.group(1))
                self._check_idx(i)
                self.lens[i] = _to_int(key, raw)
                continue
            m = SLICE_RE.match(key)
            if m:
                i, j = int(m.group(1)), int(m.group(2))
                self._check_idx(i)
                # keep RAW BYTES: a slice may split a multibyte UTF-8 char
                # (the kernel cuts at byte counts); bytes are concatenated
                # across slices and decoded ONCE at end()
                self.slices.setdefault(i, {})[j] = _to_hex_bytes(key, raw)
                continue
            # non-argv fields on an EXECVE record are ignored

    def merge(self, later: "ExecveCollector") -> None:
        """Fold a later turn-range's state into this one (salted partial
        assembly; `later` MUST cover strictly later turns)."""
        if not later.seen:
            return
        self.seen = True
        if later.argc is not None:
            if self.argc is not None:
                raise CollectError("execve: duplicate argc")
            self.argc = later.argc
        self.args.update(later.args)
        self.lens.update(later.lens)
        for i, parts in later.slices.items():
            self.slices.setdefault(i, {}).update(parts)

    def end(self) -> list[str]:
        if not self.seen:
            return []
        if self.argc is None:
            raise CollectError("execve: missing argc")
        # deferred index validation: under salted partial assembly a part
        # may collect arg tokens before knowing argc; re-check here (the
        # unsalted path already errored at add time, so this is a no-op)
        for i in sorted(set(self.args) | set(self.lens) | set(self.slices)):
            if i >= self.argc:
                raise CollectError(f"execve: arg index {i} out of range")
        for i, parts in self.slices.items():
            if i not in self.lens:
                raise CollectError(f"execve: arg {i} slices without length")
            raw = b"".join(parts[j] for j in sorted(parts))
            # length accounting is in RAW BYTES before decoding (the
            # reference counts bytes, lib/execve_coll.c:364-377) so slices
            # may split multibyte characters
            if len(raw) != self.lens[i]:
                raise CollectError(
                    f"execve: arg {i} length mismatch "
                    f"({len(raw)} != {self.lens[i]})"
                )
            self.args[i] = raw.decode("utf-8", errors="replace")
        # skipped args are filled with "" (lib/execve_coll.c gap fill)
        return [self.args.get(i, "") for i in range(self.argc)]


class PathCollector:
    """Collect PATH records by explicit `item` slot; require gapless set."""

    def __init__(self) -> None:
        self.slots: dict[int, dict] = {}
        self.seen = False

    def add(self, fields: list[Field]) -> None:
        self.seen = True
        item = next((raw for key, raw, _ in fields if key == "item"), None)
        if item is None:
            raise CollectError("path: missing item index")
        idx = _to_int("item", item)
        if idx > PATH_MAX_ITEM:
            raise CollectError(f"path: item {idx} exceeds {PATH_MAX_ITEM}")
        if idx in self.slots:
            raise CollectError(f"path: duplicate item {idx}")
        self.slots[idx] = render_fields(fields)

    def merge(self, later: "PathCollector") -> None:
        if not later.seen:
            return
        self.seen = True
        for idx, rec in later.slots.items():
            if idx in self.slots:
                raise CollectError(f"path: duplicate item {idx}")
            self.slots[idx] = rec

    def end(self) -> list[dict]:
        if not self.seen:
            return []
        if sorted(self.slots) != list(range(len(self.slots))):
            raise CollectError("path: gap in item sequence")
        return [self.slots[i] for i in sorted(self.slots)]


class RepCollector:
    """Aggregate repeated records of one kind into an array."""

    def __init__(self) -> None:
        self.items: list[dict] = []

    def add(self, fields: list[Field]) -> None:
        self.items.append(render_fields(fields))

    def end(self) -> list[dict]:
        return self.items


class EventAssembler:
    """Assemble one conversation's turns into an event document.

    Turns MUST be supplied in turn_idx order (the stable-ordering
    invariant); the caller owns the sort.
    """

    def __init__(self, with_text: bool = True, with_norm: bool = False) -> None:
        self.with_text = with_text
        self.with_norm = with_norm
        self.reset()

    def reset(self) -> None:
        self.error: str | None = None
        self.texts: list[str] = []
        self.node: str | None = None
        self.n_records = 0
        self.execve = ExecveCollector()
        self.path = PathCollector()
        self.reps: dict[str, RepCollector] = {}
        self.uniq: dict[str, dict] = {}
        self.order: list[str] = []  # first-seen kind order for `data`
        self._norm_fields: list[Field] = []
        self._norm_argv0: str | None = None

    def add_turn(self, kind: str, node: str | None, text: str,
                 fields: list[Field]) -> None:
        self.texts.append(text)
        if self.node is None and node:
            self.node = node
        if kind in DROP_KINDS:
            return
        self.n_records += 1
        if self.error is not None:
            return  # latched: remaining records contribute raw text only
        try:
            if kind == EXECVE_KIND:
                if EXECVE_KIND not in self.order:
                    self.order.append(EXECVE_KIND)
                self.execve.add(fields)
            elif kind == PATH_KIND:
                if PATH_KIND not in self.order:
                    self.order.append(PATH_KIND)
                self.path.add(fields)
            elif kind in REP_KINDS:
                if kind not in self.order:
                    self.order.append(kind)
                self.reps.setdefault(kind, RepCollector()).add(fields)
            else:
                if kind in self.uniq:
                    raise CollectError(f"repeated record kind {kind}")
                self.order.append(kind)
                self.uniq[kind] = render_fields(fields)
        except CollectError as e:
            self.error = str(e)
        if self.with_norm and self.error is None:
            self._norm_fields.extend(fields)

    def add_turn_fast(self, kind: str, node: str | None, text: str,
                      ks: list, vs: list, interp: list) -> None:
        """Hot-path variant of add_turn: the field triple arrives as three
        PARALLEL LISTS (keys, raw, interpreted) instead of materialized
        (k, r, i) tuples, and `interp is vs` signals "no interpretation
        overrides" so the dominant uniq-kind case renders its dict with a
        single C-speed comprehension.  Semantics are identical to add_turn
        (same dispatch, same error latch) — cross-checked by the
        distributed-vs-oracle parity tests, since the single-process oracle
        keeps using add_turn."""
        self.texts.append(text)
        if self.node is None and node:
            self.node = node
        if kind in DROP_KINDS:
            return
        self.n_records += 1
        if self.error is not None:
            return  # latched: remaining records contribute raw text only
        try:
            if kind == EXECVE_KIND:
                if EXECVE_KIND not in self.order:
                    self.order.append(EXECVE_KIND)
                self.execve.add(zip(ks, vs, interp))
            elif kind == PATH_KIND:
                if PATH_KIND not in self.order:
                    self.order.append(PATH_KIND)
                self.path.add(list(zip(ks, vs, interp)))
            elif kind in REP_KINDS:
                if kind not in self.order:
                    self.order.append(kind)
                if interp is vs:  # no overrides: every field renders [raw]
                    rec = {k: [v] for k, v in zip(ks, vs)}
                else:
                    rec = {}
                    for k, r, p in zip(ks, vs, interp):
                        rec[k] = [p] if p == r else [p, r]
                rep = self.reps.get(kind)
                if rep is None:
                    rep = self.reps[kind] = RepCollector()
                rep.items.append(rec)  # == RepCollector.add(render_fields)
            else:
                if kind in self.uniq:
                    raise CollectError(f"repeated record kind {kind}")
                self.order.append(kind)
                if interp is vs:  # no overrides: every field renders [raw]
                    self.uniq[kind] = {k: [v] for k, v in zip(ks, vs)}
                else:
                    out = {}
                    for k, r, p in zip(ks, vs, interp):
                        out[k] = [p] if p == r else [p, r]
                    self.uniq[kind] = out
        except CollectError as e:
            self.error = str(e)
        if self.with_norm and self.error is None:
            self._norm_fields.extend(zip(ks, vs, interp))

    def merge(self, later: "EventAssembler") -> None:
        """Fold a later turn-range's partial assembly into this one
        (salted-key skew handling, SURVEY.md §4).

        Semantics: identical to sequential assembly when the conversation
        latches at most one error; with multiple independent errors the
        surviving error MESSAGE may differ (the earliest part's add-time
        error always wins, but cross-part end-time error ordering can
        swap) — sink routing and counts are unaffected.
        """
        self.texts.extend(later.texts)
        if self.node is None:
            self.node = later.node
        self.n_records += later.n_records
        if self.error is None and later.error is not None:
            self.error = later.error
        if self.error is not None:
            return  # latched: later data contributes raw text only
        try:
            self.execve.merge(later.execve)
            self.path.merge(later.path)
            for kind, coll in later.reps.items():
                self.reps.setdefault(kind, RepCollector()).items.extend(coll.items)
            for kind, rec in later.uniq.items():
                if kind in self.uniq:
                    raise CollectError(f"repeated record kind {kind}")
                self.uniq[kind] = rec
        except CollectError as e:
            self.error = str(e)
        for k in later.order:
            if k not in self.order:
                self.order.append(k)
        self._norm_fields.extend(later._norm_fields)
        if later._norm_argv0 and not self._norm_argv0:
            self._norm_argv0 = later._norm_argv0

    def _finalize_data(self) -> dict | None:
        out: dict[str, object] = {}
        finals: dict[str, object] = {}
        try:
            argv = self.execve.end()
            if self.execve.seen:
                finals[EXECVE_KIND] = argv
                self._norm_argv0 = argv[0] if argv else None
            items = self.path.end()
            if self.path.seen:
                finals[PATH_KIND] = items
            for kind in REP_KINDS:
                if kind in self.reps:
                    finals[kind] = self.reps[kind].end()
        except CollectError as e:
            self.error = str(e)
            return None
        for kind in self.order:
            if kind in finals:
                out[kind.lower()] = finals[kind]
            elif kind in self.uniq:
                out[kind.lower()] = self.uniq[kind]
        return out

    def _norm(self) -> dict:
        uid = next((i for k, _, i in self._norm_fields if k in ("uid", "auid", "euid")), "unknown")
        syscall = next((i for k, _, i in self._norm_fields if k == "syscall"), None)
        obj = next((i for k, _, i in self._norm_fields if k == "name"), None)
        fail = any(k == "exit" and r != "0" for k, r, _ in self._norm_fields)
        action = self._norm_argv0 or syscall or "dialog"
        norm = {"subject": uid, "action": action, "result": "fail" if fail else "success"}
        if obj is not None:
            norm["object"] = obj
        return norm

    def end(self, conv_id: str, ts_first_iso: str) -> dict | None:
        """Return the event document, or None (drop-empty rule)."""
        data = None
        if self.error is None:
            data = self._finalize_data()
        if self.n_records == 0 and self.error is None:
            return None  # lib/conv_buf.c:570-574
        doc: dict = {"serial": conv_id, "time": ts_first_iso}
        if self.node:
            doc["node"] = self.node
        if self.with_text:
            doc["text"] = self.texts
        if self.error is not None:
            doc["error"] = self.error  # data node voided (lib/conv_buf.c:627-648)
        else:
            doc["data"] = data
            if self.with_norm:
                doc["norm"] = self._norm()
        return doc


def doc_size(doc: dict) -> int:
    return len(encode_doc_bytes(doc))


def dump_trim_tree(doc: dict, fmt=None) -> str:
    """T4 analogue — debug dump of the trim-priority structure
    (/root/reference/lib/gbtree.c:694-829 renders
    {"type":"tree","nodes":[...],"prios":[...]}; the reference prints it
    fully unfolded with nest_indent=4, gbtree.c:793-797).

    Nodes are this engine's trim units with their serialized byte
    lengths; prios lists node indices by DROP priority, mirroring
    trim_doc's order exactly: prio 0 = non-removable envelope + single
    records, then repeated-record items (dropped third), text lines
    (dropped second), norm (dropped first) — trim removes from the
    highest priority down, like aushape_gbtree_trim voids trailing
    priority levels (gbtree.c:555-606)."""
    import json as _json

    from .foldout import FOLD_NONE, FoldFormat, render_json

    def blen(v) -> int:
        return len(_json.dumps(v, ensure_ascii=False,
                               separators=(",", ":")).encode())

    nodes: list[dict] = []
    prios: list[list[int]] = [[], [], [], [], []]

    def add(kind: str, path: str, length: int, prio: int) -> None:
        prios[prio].append(len(nodes))
        nodes.append({"index": len(nodes), "kind": kind, "path": path,
                      "len": length})

    env = {k: doc[k] for k in ("serial", "time", "node", "error")
           if k in doc and doc.get(k) is not None}
    add("envelope", "", blen(env), 0)
    data = doc.get("data")
    if isinstance(data, dict):
        for k in sorted(data):
            v = data[k]
            if isinstance(v, list):
                for i, item in enumerate(v):
                    add("item", f"data/{k}/{i}", blen(item), 1)
            else:
                add("record", f"data/{k}", blen(v), 0)
    for i, line in enumerate(doc.get("text") or []):
        add("text", f"text/{i}", blen(line), 2)
    if "norm" in doc:
        add("norm", "norm", blen(doc["norm"]), 3)

    tree = {
        "type": "tree",
        "nodes": nodes,
        "prios": [{"prio": p, "nodes": idxs, "len":
                   sum(nodes[i]["len"] for i in idxs)}
                  for p, idxs in enumerate(prios) if idxs],
    }
    fmt = fmt or FoldFormat(fold_level=FOLD_NONE, nest_indent=4)
    return render_json(tree, fmt)


def trim_doc(doc: dict, max_size: int | None) -> dict:
    """Deterministic trim-to-size (priority semantics of lib/gbtree.c:555-606).

    Drop order: norm, then text lines from the tail, then repeated-record
    array items from the tail (per kind, sorted), then void `data` entirely.
    The `trimmed` marker list is included in the size accounting (the
    reference re-trims after adding the marker, lib/conv_buf.c:676-692).
    """
    if max_size is None or doc_size(doc) <= max_size:
        return doc
    max_size = max(1024, max_size)
    trimmed: list[str] = []
    # copy-on-write of every list this function pops from: the caller's
    # doc (and the assembler's texts / collector arrays it references)
    # must survive intact — the event row's `text` column is the full
    # per-turn text regardless of doc trimming
    doc = dict(doc)
    if isinstance(doc.get("text"), list):
        doc["text"] = list(doc["text"])
    if isinstance(doc.get("data"), dict):
        doc["data"] = {k: (list(v) if isinstance(v, list) else v)
                       for k, v in doc["data"].items()}
    doc["trimmed"] = trimmed

    def fits() -> bool:
        return doc_size(doc) <= max_size

    if "norm" in doc:
        del doc["norm"]
        trimmed.append("norm")
        if fits():
            return doc
    texts = doc.get("text")
    if texts:
        marked = False
        while texts and not fits():
            texts.pop()
            if not marked:
                trimmed.append("text")
                marked = True
        if fits():
            return doc
    data = doc.get("data")
    if isinstance(data, dict):
        for kind in sorted(data):
            v = data[kind]
            if isinstance(v, list):
                marked = False
                while v and not fits():
                    v.pop()
                    if not marked:
                        trimmed.append(f"data/{kind}")
                        marked = True
                if fits():
                    return doc
        doc["data"] = {}
        trimmed.append("data")
    return doc


def route_sink(error: str | None, any_tool_turn: bool) -> str:
    if error is not None:
        return SINK_ERROR
    return SINK_TOOL if any_tool_turn else SINK_DIALOG
