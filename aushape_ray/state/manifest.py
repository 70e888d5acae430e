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


def find_shards(input_dir: str) -> list[str]:
    """Input shard discovery: *.parquet directly in input_dir, falling
    back to a recursive sweep (generators often nest shards one level
    down).  Raises on an empty result — silently processing zero shards
    would report empty sink counts as if the run succeeded."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        files = sorted(glob.glob(os.path.join(input_dir, "**", "*.parquet"),
                                 recursive=True))
    if not files:
        raise FileNotFoundError(
            f"no *.parquet shards under {input_dir!r} (searched recursively)")
    return files


def shard_key(path: str, input_dir: "str | None" = None) -> str:
    """Manifest/output key for one input shard.  Keyed by the path
    RELATIVE to input_dir (separators flattened) so that nested shard
    layouts with repeated basenames (shard-00/part-0.parquet,
    shard-01/part-0.parquet — exactly what the recursive find_shards
    fallback discovers) cannot collide and clobber each other's outputs."""
    if input_dir:
        rel = os.path.relpath(path, input_dir)
        if not rel.startswith(".."):
            return os.path.splitext(rel)[0].replace(os.sep, "__")
    return os.path.splitext(os.path.basename(path))[0]


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
                 input_dir: "str | None" = None) -> None:
        self.out_dir = out_dir
        self.cfg = cfg
        self.input_dir = input_dir
        self.__name__ = "resumable_shard"

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
            table = pq.read_table(path)
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


def run_resumable(input_dir: str, out_dir: str,
                  cfg: PipelineConfig = PipelineConfig()) -> dict:
    """Process all input shards, skipping ones already completed with a
    matching input fingerprint.  Returns {processed, skipped, sink_counts}.
    """
    files = find_shards(input_dir)
    from ..pipelines.events_pipeline import check_shard_contiguity

    check_shard_contiguity(files)  # per-shard assembly needs the guarantee
    done = completed_shards(out_dir)
    todo = []
    skipped = 0
    for f in files:
        key = shard_key(f, input_dir)
        m = done.get(key)
        if m and m.get("input") == fingerprint(f):
            skipped += 1
        else:
            todo.append(f)
    if todo:
        ds = ray.data.from_items([{"path": f} for f in todo])
        ds.map_batches(_ResumableShardWriter(out_dir, cfg, input_dir),
                       batch_size=1,
                       batch_format="numpy").materialize()
    # aggregate ONLY over manifests whose shard is in the current input set:
    # stale manifests (input files removed/renamed since an earlier run)
    # must not inflate the totals
    current = {shard_key(f, input_dir) for f in files}
    total: dict[str, int] = {}
    orphans = []
    for key, m in completed_shards(out_dir).items():
        if key not in current:
            orphans.append(key)
            continue
        for sink, n in m["sink_counts"].items():
            total[sink] = total.get(sink, 0) + n
    out = {"processed": len(todo), "skipped": skipped, "sink_counts": total}
    if orphans:
        out["orphaned_shards"] = sorted(orphans)
    return out
