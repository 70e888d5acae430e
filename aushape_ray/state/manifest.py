"""Per-partition lineage manifests + checkpoint/resume.

The resumable unit is one input shard.  Each Ray task:
  read shard -> parse -> enrich -> assemble -> write per-sink parquet under
  a shard-scoped tmp dir -> atomic rename -> write manifest JSON (atomic).

A manifest records the input fingerprint (path, size, mtime), per-sink row
counts, output files and timing — the lineage + metrics of that partition.
`run_resumable` skips shards whose manifest exists and still matches the
input fingerprint, so a killed run re-does only unfinished shards and a
changed input invalidates exactly the affected shards.  No global
coordination: idempotence is per-shard rename + manifest.

The reference has no checkpointing (upstream auditd owns the stream
position, SURVEY.md §4); this is the designed-for-100TB replacement.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time

import pyarrow as pa

import ray.data

from ..config import PipelineConfig


def find_shards(input_dir: str, pattern: str = "*.parquet") -> list[str]:
    """Input shard discovery: `pattern` directly in input_dir, falling
    back to a recursive sweep (generators often nest shards one level
    down).  Raises on an empty result — silently processing zero shards
    would report empty sink counts as if the run succeeded."""
    files = sorted(glob.glob(os.path.join(input_dir, pattern)))
    if not files:
        files = sorted(glob.glob(os.path.join(input_dir, "**", pattern),
                                 recursive=True))
    if not files:
        raise FileNotFoundError(
            f"no {pattern} shards under {input_dir!r} (searched recursively)")
    return files


def shard_key(path: str, input_dir: "str | None" = None) -> str:
    """Manifest/output key for one input shard.  Keyed by the path
    RELATIVE to input_dir (separators flattened) so that nested shard
    layouts with repeated basenames (shard-00/part-0.parquet,
    shard-01/part-0.parquet — exactly what the recursive find_shards
    fallback discovers) cannot collide and clobber each other's outputs.
    The FULL file name is kept — stripping the extension collapsed
    rotation suffixes (audit.log.1 / audit.log.2 -> one key) and the
    second shard clobbered the first's manifest."""
    if input_dir:
        rel = os.path.relpath(path, input_dir)
        if not rel.startswith(".."):
            return rel.replace(os.sep, "__")
    return os.path.basename(path)


def fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": path, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def manifest_path(out_dir: str, key: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{key}.json")


def load_manifest(out_dir: str, key: str) -> dict | None:
    try:
        with open(manifest_path(out_dir, key)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def completed_shards(out_dir: str) -> dict[str, dict]:
    out = {}
    for p in glob.glob(os.path.join(out_dir, "_manifests", "*.json")):
        try:
            with open(p) as f:
                m = json.load(f)
            out[m["shard"]] = m
        except (OSError, json.JSONDecodeError, KeyError):
            continue
    return out


class _ResumableShardWriter:
    """One task per shard: assemble + write + manifest (all shard-local)."""

    def __init__(self, out_dir: str, cfg: PipelineConfig,
                 input_dir: "str | None" = None,
                 input_format: str = "parquet") -> None:
        self.out_dir = out_dir
        self.cfg = cfg
        self.input_dir = input_dir
        self.input_format = input_format
        self.__name__ = "resumable_shard"

    def _read(self, path: str) -> pa.Table:
        if self.input_format == "rawlog":
            # _open_log, not open(): rotated auditd logs are commonly
            # gzipped (audit.log.1.gz matches the *.log* shard glob) and a
            # plain text read of one would silently yield 0 events
            from ..sources.rawlog import _open_log, parse_audit_lines

            with _open_log(path) as f:
                return parse_audit_lines(f.readlines())
        import pyarrow.parquet as pq

        return pq.read_table(path)

    def __call__(self, batch) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..stages.assemble import AssemblePartition
        from ..stages.enrich import enrich_batch
        from ..stages.parse import parse_batch
        from .manifest import fingerprint  # self-import safe in workers

        rows = {"shard": [], "n_events": [], "sec": []}
        for path in batch["path"]:
            key = shard_key(path, self.input_dir)
            t0 = time.time()
            table = self._read(path)
            events = AssemblePartition(
                with_text=self.cfg.with_text, with_norm=self.cfg.with_norm,
                max_event_size=self.cfg.max_event_size,
            )(enrich_batch(parse_batch(table)))

            shard_dir = os.path.join(self.out_dir, "shards", key)
            tmp_dir = shard_dir + ".tmp"
            shutil.rmtree(tmp_dir, ignore_errors=True)
            os.makedirs(tmp_dir, exist_ok=True)
            counts: dict[str, int] = {}
            files: list[str] = []
            for sink in events.column("sink").unique().to_pylist():
                sub = events.filter(pc.equal(events.column("sink"), sink))
                fname = os.path.join(tmp_dir, f"sink={sink}.parquet")
                pq.write_table(sub, fname)
                counts[sink] = sub.num_rows
                files.append(os.path.join(shard_dir, f"sink={sink}.parquet"))
            shutil.rmtree(shard_dir, ignore_errors=True)
            os.replace(tmp_dir, shard_dir)

            man = {
                "shard": key,
                "input": fingerprint(path),
                "sink_counts": counts,
                "n_events": int(events.num_rows),
                "n_turns": int(table.num_rows),
                "outputs": files,
                "sec": round(time.time() - t0, 3),
            }
            mp = manifest_path(self.out_dir, key)
            os.makedirs(os.path.dirname(mp), exist_ok=True)
            tmp = mp + ".tmp"
            with open(tmp, "w") as f:
                json.dump(man, f)
            os.replace(tmp, mp)
            rows["shard"].append(key)
            rows["n_events"].append(int(events.num_rows))
            rows["sec"].append(man["sec"])
        return pa.table({
            "shard": pa.array(rows["shard"], pa.string()),
            "n_events": pa.array(rows["n_events"], pa.int64()),
            "sec": pa.array(rows["sec"], pa.float64()),
        })


def _check_rawlog_contiguity(files: "list[str]") -> None:
    """Rotation-boundary guard for raw logs: the last serial of each file
    must differ from the first serial of the next (auditd CAN split an
    event across rotations; our per-file assembly requires it did not).
    A necessary, cheap check — reads only each file's framing edges."""
    import re as _re

    stamp = _re.compile(r"msg=audit\(\d+\.\d{1,3}:(\S+?)\):")

    def edge_serials(path):
        from ..sources.rawlog import _open_log

        first = last = None
        with _open_log(path) as f:  # gz-aware: rotations may be gzipped
            for line in f:
                m = stamp.search(line)
                if m:
                    last = m.group(1)
                    if first is None:
                        first = m.group(1)
        return first, last

    prev_last, prev_f = None, None
    for f in files:
        first, last = edge_serials(f)
        if first is not None and prev_last is not None \
                and first == prev_last:
            raise ValueError(
                f"rawlog shards not conversation-contiguous: serial "
                f"{first!r} spans {prev_f!r} and {f!r}")
        if last is not None:
            prev_last, prev_f = last, f


def _discover_checked(input_dir: str, input_format: str) -> list[str]:
    """Shard discovery + the contiguity guard the per-shard assembly
    relies on (shared by run_resumable and run_follow)."""
    if input_format == "rawlog":
        files = find_shards(input_dir, "*.log*")
        _check_rawlog_contiguity(files)
    else:
        files = find_shards(input_dir)
        from ..pipelines.events_pipeline import check_shard_contiguity

        check_shard_contiguity(files)  # per-shard assembly needs the guarantee
    return files


def _select_todo(files: list[str], out_dir: str,
                 input_dir: "str | None") -> "tuple[list[str], int]":
    """Split the current shard set into (todo, n_skipped) by manifest +
    input fingerprint (a changed rotation invalidates exactly itself)."""
    done = completed_shards(out_dir)
    todo = []
    skipped = 0
    for f in files:
        m = done.get(shard_key(f, input_dir))
        if m and m.get("input") == fingerprint(f):
            skipped += 1
        else:
            todo.append(f)
    return todo, skipped


def _process_shards(todo: list[str], out_dir: str, cfg: PipelineConfig,
                    input_dir: "str | None", input_format: str) -> None:
    ds = ray.data.from_items([{"path": f} for f in todo])
    ds.map_batches(_ResumableShardWriter(out_dir, cfg, input_dir,
                                         input_format),
                   batch_size=1,
                   batch_format="numpy").materialize()


def _aggregate(files: list[str], out_dir: str,
               input_dir: "str | None") -> "tuple[dict[str, int], list[str]]":
    """Per-sink totals over manifests of the CURRENT input set only: stale
    manifests (input files removed/renamed since an earlier run) must not
    inflate the totals."""
    current = {shard_key(f, input_dir) for f in files}
    total: dict[str, int] = {}
    orphans = []
    for key, m in completed_shards(out_dir).items():
        if key not in current:
            orphans.append(key)
            continue
        for sink, n in m["sink_counts"].items():
            total[sink] = total.get(sink, 0) + n
    return total, orphans


def run_resumable(input_dir: str, out_dir: str,
                  cfg: PipelineConfig = PipelineConfig(),
                  input_format: str = "parquet") -> dict:
    """Process all input shards, skipping ones already completed with a
    matching input fingerprint.  Returns {processed, skipped, sink_counts}.
    input_format "rawlog" consumes raw auditd text rotations instead of
    parquet (same per-shard manifest/rename idempotence)."""
    files = _discover_checked(input_dir, input_format)
    todo, skipped = _select_todo(files, out_dir, input_dir)
    if todo:
        _process_shards(todo, out_dir, cfg, input_dir, input_format)
    total, orphans = _aggregate(files, out_dir, input_dir)
    out = {"processed": len(todo), "skipped": skipped, "sink_counts": total}
    if orphans:
        out["orphaned_shards"] = sorted(orphans)
    return out


def run_follow(input_dir: str, out_dir: str,
               cfg: PipelineConfig = PipelineConfig(),
               input_format: str = "parquet",
               poll_interval: float = 1.0,
               idle_timeout: "float | None" = None,
               max_polls: "int | None" = None,
               stop_file: "str | None" = None,
               quiesce_sec: float = 0.0) -> dict:
    """Continuous tailing ingest — the audispd live-plugin analogue
    (reference README.md:167-208, where aushape consumes a live pipe and
    emits one document per event as it completes).  Polls input_dir and
    processes newly appeared or fingerprint-CHANGED rotations
    incrementally through the same per-shard manifest machinery as
    run_resumable: every completed shard is an atomic rename + manifest,
    so a kill at ANY point loses nothing — the next follow (or a plain
    --resume batch run) redoes exactly the unfinished shards, and
    re-delivering a finished shard is impossible (idempotence drill in
    tests/test_follow.py).

    Stop conditions (any):
      stop_file      — path whose appearance ends the loop (checked every
                       cycle; the operational kill switch),
      idle_timeout   — seconds without new work,
      max_polls      — fixed number of cycles (tests/batch drains).
    quiesce_sec > 0 skips files modified within the last quiesce_sec —
    use when the producer writes rotations in place non-atomically.

    Returns {cycles, processed, skipped_final, sink_counts, stopped_by}.
    """
    import time as _time

    cycles = 0
    processed = 0
    last_work = _time.monotonic()
    stopped_by = "max_polls"
    files: list[str] = []
    while True:
        if stop_file and os.path.exists(stop_file):
            stopped_by = "stop_file"
            break
        if max_polls is not None and cycles >= max_polls:
            stopped_by = "max_polls"
            break
        cycles += 1
        try:
            files = _discover_checked(input_dir, input_format)
        except FileNotFoundError:
            files = []  # nothing yet — an empty dir is a normal live start
        if quiesce_sec > 0:
            now = _time.time()
            files = [f for f in files
                     if now - os.stat(f).st_mtime >= quiesce_sec]
        todo, _skipped = _select_todo(files, out_dir, input_dir)
        if todo:
            _process_shards(todo, out_dir, cfg, input_dir, input_format)
            processed += len(todo)
            last_work = _time.monotonic()
        elif idle_timeout is not None \
                and _time.monotonic() - last_work >= idle_timeout:
            stopped_by = "idle_timeout"
            break
        _time.sleep(poll_interval)
    if not files:
        try:
            files = _discover_checked(input_dir, input_format)
        except FileNotFoundError:
            files = []
    total, orphans = _aggregate(files, out_dir, input_dir)
    _t, skipped_final = _select_todo(files, out_dir, input_dir)
    out = {"cycles": cycles, "processed": processed,
           "skipped_final": skipped_final, "sink_counts": total,
           "stopped_by": stopped_by}
    if orphans:
        out["orphaned_shards"] = sorted(orphans)
    return out
