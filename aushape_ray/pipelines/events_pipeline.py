"""The flagship parse → enrich → coalesce → route → aggregate pipeline.

Ray-Data-first composition (SURVEY.md §3 rebuild lifecycle):

    read_parquet(transcripts)                       # columns pruned
      -> map_batches(parse_batch, pyarrow, 0-copy)  # stateless tasks
      -> map_batches(enrich_batch)                  # per-worker dicts
      -> add_part (hash conv_id % P, salted hot)    # tiny stateless map
      -> groupby("part").map_groups(Assemble)       # THE one shuffle
      -> [+ partial-merge groupby when salting]
      -> per-sink write (parquet hive / jsonl / xml) + sink counts

    A shuffle-free variant (events_contiguous) covers conversation-
    contiguous shard layouts; per-shard manifests (state.manifest) make
    runs resumable.

Never calls ray.init(); the caller owns the session.
"""

from __future__ import annotations

import ray.data

from ..config import PipelineConfig
from ..fixtures import ensure_transcripts
from ..grammar import SINKS
from ..stages.assemble import AssemblePartition, add_part
from ..stages.enrich import Enricher, enrich_batch
from ..stages.parse import parse_batch

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _configure_shuffle(cfg: PipelineConfig) -> None:
    """Select the exchange implementation for the one conv_id shuffle.

    Must run BEFORE the Dataset is created: each Dataset snapshots the
    DataContext at creation time, and the groupby planner consults that
    snapshot.  Measured on this corpus (337k turns, 32 cpus, warm):
    sort-based pull shuffle ~2.5s vs hash-shuffle aggregators ~12s — the
    aggregator actor architecture only pays off when partition outputs are
    large; default is sort.  When hash is chosen, aggregator actors are
    capped to half the cluster CPUs (the default of 64 deadlocks a 4-CPU
    session with idle aggregators holding every slot).
    """
    import ray as _ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    if cfg.shuffle == "hash":
        ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
        try:
            n_cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
        except Exception:
            n_cpus = 8
        ctx.max_hash_shuffle_aggregators = max(1, min(64, n_cpus // 2))
    else:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED


def read_transcripts(sf_dir: str,
                     cfg: PipelineConfig = PipelineConfig(),
                     columns: "list[str] | None" = None) -> "ray.data.Dataset":
    """Transcript read, column-pruned: pass `columns` when a query needs
    only a projection — the text column dominates the table's bytes, so
    analytics that never touch it should not pull it off storage."""
    path = ensure_transcripts(sf_dir)
    _configure_shuffle(cfg)
    return ray.data.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS)


def build_events(ds: "ray.data.Dataset",
                 cfg: PipelineConfig = PipelineConfig(),
                 defer_partial_merge: bool = False) -> "ray.data.Dataset":
    """Transcript rows -> assembled event rows (EVENT_SCHEMA).

    The one groupby exchange runs on the strategy cfg.shuffle selects
    (sort-based pull shuffle by default; see _configure_shuffle).
    NOTE: the strategy only applies if it was set before `ds` was created
    (read_transcripts does this); set it in your session before building
    datasets from other sources.

    defer_partial_merge (salted runs only): return the raw PARTIAL_SCHEMA
    assemble output — finished events plus unpicked partial rows — for a
    consumer that merges the partial side-channel itself (write_routed's
    in-stream sink write).  Ignored when no conversation is hot.
    """
    _configure_shuffle(cfg)

    # the actor-pool enrich tokenizes before the exchange, so it implies
    # parse_stage="pre" regardless of the config default
    late_parse = cfg.parse_stage == "post" and cfg.enrich_mode != "actors"
    if late_parse:
        # project-early-parse-late: ship only the raw turn projection
        # through the exchange; tokenize+enrich inside assemble
        import pyarrow.compute as pc

        def project(batch):
            import pyarrow as pa

            text = batch.column("text")
            if text.null_count:
                text = text.fill_null("")
            return pa.table({
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
                "ts": batch.column("ts"),
                "text": text,
                "is_tool": pc.equal(batch.column("role"), "tool"),
            })

        enriched = ds.map_batches(project, batch_format="pyarrow",
                                  batch_size=cfg.batch_size,
                                  zero_copy_batch=True)
    elif cfg.enrich_mode == "actors":
        enriched = ds.map_batches(
            parse_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
            zero_copy_batch=True,
        ).map_batches(
            Enricher, fn_constructor_kwargs={"sparse": True},
            batch_format="pyarrow", batch_size=cfg.batch_size,
            concurrency=cfg.enrich_concurrency,
        )
    else:
        enriched = ds.map_batches(
            parse_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
            zero_copy_batch=True,
        ).map_batches(
            enrich_batch, batch_format="pyarrow", batch_size=cfg.batch_size,
        )
    hot: dict[str, int] | None = None
    if cfg.salt_threshold:
        hot = _find_hot_convs(ds, cfg)

    parted = enriched.map_batches(
        lambda b: add_part(b, cfg.num_parts, hot),
        batch_format="pyarrow", batch_size=cfg.batch_size,
    )
    assembled = parted.groupby("part", num_partitions=cfg.num_parts).map_groups(
        AssemblePartition(
            with_text=cfg.with_text, with_norm=cfg.with_norm,
            max_event_size=cfg.max_event_size,
            emit_partials=bool(hot),
            parse_in_stage=late_parse,
        ),
        batch_format="pyarrow",
    )
    if not hot:
        return assembled
    if defer_partial_merge:
        # PARTIAL_SCHEMA; the consumer owns the merge.  The marker attr is
        # how write_routed detects the shape without touching the lazy
        # plan (Dataset.schema() would trigger partial execution).
        assembled._aushape_has_partials = True
        return assembled

    # salted path, fully streaming (no materialize, single execution): one
    # more groupby keyed on the conversation's MERGE PARTITION — within a
    # partition finished events pass through, each hot conversation's
    # n_salts partial rows merge in salt order.  Events are far smaller
    # than the input turns, and the stream is never pinned in the object
    # store.  When the consumer is a sink write, prefer
    # write_routed(events, ..., cfg) on the defer_partial_merge output:
    # finished events go straight to sink files in-stream and ONLY the
    # partial side-channel (n_salts rows per hot conversation) takes the
    # second exchange.
    from ..stages.assemble import add_merge_part, make_merge_or_pass

    tagged = assembled.map_batches(
        lambda b: add_merge_part(b, cfg.num_parts), batch_format="pyarrow")
    return tagged.groupby("mpart", num_partitions=cfg.num_parts).map_groups(
        make_merge_or_pass(cfg.with_text, cfg.with_norm, cfg.max_event_size),
        batch_format="pyarrow",
    )


def _find_hot_convs(ds: "ray.data.Dataset", cfg: PipelineConfig) -> dict[str, int]:
    """Pre-pass: conv_id -> salt chunk size for conversations longer than
    salt_threshold.  Reads only the conv_id column; per-batch partial
    counts, then a raw-Ray bucket_reduce tree exchange (hash(conv_id)
    bucket, vectorized pandas sum, > threshold filter pushed into the
    reduce task) so only hot rows ever reach the driver.  bucket_reduce
    is the right exchange here because the result IS a driver dict (the
    broadcast salt table): Ray Data's sort-based Sum aggregate carries
    ~3s of fixed exchange cost at any size (see joins.bucket_reduce)."""
    import math
    import zlib

    import numpy as np
    import pyarrow as pa

    from ..functions.joins import bucket_reduce

    thresh = cfg.salt_threshold
    n_buckets = 16

    def partial(batch: pa.Table) -> pa.Table:
        vc = batch.column("conv_id").combine_chunks().value_counts()
        vals = vc.field("values")
        if vals.null_count:  # null conv_ids never salt (one conversation
            import pyarrow.compute as pc  # with cid=None, oracle semantics)
            vc = vc.filter(pc.is_valid(vals))
            vals = vc.field("values")
        b = np.fromiter(
            (zlib.crc32(s.encode()) for s in vals.to_pylist()),
            dtype=np.int64, count=len(vals)) % n_buckets
        return pa.table({
            "b": pa.array(b, pa.int32()),
            "conv_id": vals,
            "n": vc.field("counts").cast(pa.int64()),
        })

    def hot_in_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(
            g.column("n").to_numpy(zero_copy_only=False),
            index=g.column("conv_id").to_pylist()).groupby(level=0).sum()
        keep = s[s > thresh]
        return pa.table({
            "conv_id": pa.array(keep.index.to_list(), pa.string()),
            "n": pa.array(keep.to_numpy(), pa.int64()),
        })

    partials = ds.select_columns(["conv_id"]).map_batches(
        partial, batch_format="pyarrow")
    hot: dict[str, int] = {}
    for tbl in bucket_reduce(partials, n_buckets, hot_in_bucket):
        for cid, n in zip(tbl.column("conv_id").to_pylist(),
                          tbl.column("n").to_pylist()):
            hot[cid] = math.ceil(n / cfg.n_salts)
    return hot


def events_for(sf_dir: str, cfg: PipelineConfig = PipelineConfig()) -> "ray.data.Dataset":
    return build_events(read_transcripts(sf_dir, cfg), cfg)


def check_shard_contiguity(files: list[str]) -> None:
    """Cheap parquet-footer guard for the shuffle-free paths: the conv_id
    min/max ranges of the shards must be pairwise disjoint (a necessary
    condition for no conversation spanning shards, and sufficient when
    shards are written conversation-sorted, as log rotation produces).
    Raises ValueError on overlap; silently passes when footers carry no
    column statistics (nothing to check against).
    """
    import pyarrow.parquet as pq

    ranges = []
    for f in files:
        md = pq.ParquetFile(f)
        idx = md.schema_arrow.get_field_index("conv_id")
        if idx < 0:
            continue  # unverifiable file: skip it, still check the rest
        lo = hi = None
        verifiable = True
        for rg in range(md.metadata.num_row_groups):
            st = md.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                verifiable = False  # no stats: caller asserted this file
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if verifiable and lo is not None:
            ranges.append((lo, hi, f))
    ranges.sort()
    for a, b in zip(ranges, ranges[1:]):
        if a[1] >= b[0]:
            raise ValueError(
                f"shards are not conversation-contiguous: conv_id ranges of "
                f"{a[2]} and {b[2]} overlap ({a[1]!r} >= {b[0]!r}); use the "
                f"general shuffle path (build_events / CLI without "
                f"--contiguous)")


class _ShardAssembler:
    """One task per input shard: read -> parse -> enrich -> assemble, no
    shuffle.  Valid ONLY under the contiguity guarantee."""

    def __init__(self, cfg: PipelineConfig) -> None:
        self.cfg = cfg
        self.__name__ = "assemble_shard"

    def __call__(self, batch) -> "ray.data.block.Block":
        import pyarrow.parquet as pq

        from ..stages.enrich import enrich_batch

        cfg = self.cfg
        out = []
        for path in batch["path"]:
            table = pq.read_table(path, columns=TRANSCRIPT_COLUMNS)
            parsed = parse_batch(table)
            enriched = enrich_batch(parsed)
            asm = AssemblePartition(
                with_text=cfg.with_text, with_norm=cfg.with_norm,
                max_event_size=cfg.max_event_size)
            out.append(asm(enriched))
        import pyarrow as pa

        return pa.concat_tables(out) if out else None


def events_contiguous(sf_dir: str, cfg: PipelineConfig = PipelineConfig(),
                      epochs: int = 1) -> "ray.data.Dataset":
    """Shuffle-free fast path: assemble each input shard independently.

    Valid when conversations never span input files — the streaming-log
    contiguity assumption the reference itself relies on (records of one
    event are consecutive in the input; /root/reference/lib/conv.c:72-81,
    SURVEY.md §2.7).  The generated corpus shards on conversation
    boundaries, as a log collector's rotation would.  One task per shard:
    read -> parse -> enrich -> assemble, zero bytes exchanged; per-shard
    outputs are the natural resume/checkpoint unit.  At 100 TB this is the
    primary path; `events_for` (hash shuffle) is the general fallback for
    inputs without the guarantee.
    """
    import glob as _glob

    path = ensure_transcripts(sf_dir)
    files = sorted(_glob.glob(f"{path}/*.parquet"))
    return events_from_shards(files, cfg, epochs=epochs)


def events_from_shards(files: list[str], cfg: PipelineConfig = PipelineConfig(),
                       epochs: int = 1) -> "ray.data.Dataset":
    """Shuffle-free assembly over explicit shard files (guarded)."""
    check_shard_contiguity(files)
    paths = list(files) * max(1, epochs)
    ds = ray.data.from_items([{"path": f} for f in paths])
    return ds.map_batches(_ShardAssembler(cfg), batch_size=1,
                          batch_format="numpy")


def sink_counts(events: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-sink aggregate counts (A2 analogue — the north-rule check)."""
    return events.groupby("sink").count()


class JsonlSinkWriter:
    """Discrete sink (S4 analogue — lib/syslog_output.c:42-66): one
    document per line, the `events_per_doc=0` bare-event mode where each
    event is exactly one message.  Each task appends its batch to per-sink
    part files named by a uuid (atomic tmp+rename), so the write is a
    single streaming pass with no materialization and no re-execution.

    With a non-compact FoldFormat (--fold / --indent, lib/conf.c:31-81)
    each part file is instead ONE folded document — a JSON array of
    events / an <?xml?><log> wrapper — in the reference README.md:22-74
    shape.  An optional syslog PRI prefix (`<facility*8+priority>`)
    frames each compact line the way the syslog output would."""

    def __init__(self, out_dir: str, column: str = "doc",
                 fmt=None, xml: bool = False, pri: "int | None" = None) -> None:
        self.out_dir = out_dir
        self.column = column
        self.fmt = fmt
        self.xml = xml
        self.pri = pri
        self.__name__ = "jsonl_sink_writer"

    def _folded(self, docs: list[str]) -> str:
        import json

        from ..foldout import render_doc_json, render_doc_xml
        from ..xmlout import event_node

        objs = [json.loads(d) for d in docs]
        if self.xml:
            return render_doc_xml([event_node(o) for o in objs], self.fmt)
        return render_doc_json(objs, self.fmt)

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc

        folded = self.fmt is not None and self.fmt.fold_level != 0
        ext = "xml" if self.xml else ("json" if folded else "jsonl")
        counts = {}
        for sink in batch.column("sink").unique().to_pylist():
            sub = batch.filter(pc.equal(batch.column("sink"), sink))
            d = os.path.join(self.out_dir, sink)
            os.makedirs(d, exist_ok=True)
            uid = uuid.uuid4().hex
            tmp = os.path.join(d, f".part-{uid}.tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                docs = sub.column(self.column).to_pylist()
                if folded:
                    f.write(self._folded(docs))
                    f.write("\n")
                else:
                    pri = f"<{self.pri}>" if self.pri is not None else ""
                    for doc in docs:
                        f.write(pri)
                        f.write(doc)
                        f.write("\n")
            os.replace(tmp, os.path.join(d, f"part-{uid}.{ext}"))
            counts[sink] = sub.num_rows
        return pa.table({
            "sink": pa.array(list(counts), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })


def write_jsonl_routed(events: "ray.data.Dataset", out_dir: str,
                       xml: bool = False, fmt=None,
                       pri: "int | None" = None) -> dict[str, int]:
    """Routed discrete-sink write: JSON-lines (or XML-lines) per sink;
    folded documents instead when fmt has fold_level != 0.

    Cleans this writer's per-sink dirs first so a rerun into the same
    out_dir replaces, not appends, the previous generation.

    pri (syslog framing) requires compact documents: a <PRI> prefix on a
    multi-line folded document would be neither valid JSON for the
    folded-file consumers nor line-framed syslog — rejected explicitly."""
    import os as _os
    import shutil as _shutil

    if pri is not None and fmt is not None and fmt.fold_level != 0:
        raise ValueError("syslog <PRI> framing requires compact output "
                         "(--fold all); folded documents are multi-line")

    for sink in SINKS:
        d = _os.path.join(out_dir, sink)
        if _os.path.isdir(d):
            _shutil.rmtree(d)
    ds = events
    column = "doc"
    folded = fmt is not None and fmt.fold_level != 0
    if xml and not folded:
        from ..xmlout import add_xml_column

        ds = ds.map_batches(add_xml_column, batch_format="pyarrow")
        column = "doc_xml"
    parts = ds.map_batches(
        JsonlSinkWriter(out_dir, column, fmt=fmt, xml=xml, pri=pri),
        batch_format="pyarrow")
    from ray.data.aggregate import Sum

    out = parts.groupby("sink").aggregate(Sum("n", alias_name="n")).take_all()
    return {r["sink"]: int(r["n"]) for r in out}


class ParquetSinkWriter:
    """In-stream hive-layout parquet sink writer (the salted side-channel,
    verdict r4 item 2 / the old build_events docstring's 100-TB design):
    each task writes its batch's FINISHED events straight to
    `out_dir/sink=<name>/part-<uuid>.parquet` (atomic tmp+rename, same
    layout as write_parquet(partition_cols=["sink"]), events_per_doc rows
    per file max) and forwards ONLY the partial rows downstream.  Finished
    events therefore never enter a second exchange or the object store —
    only n_salts rows per hot conversation move again."""

    def __init__(self, out_dir: str, events_per_doc: "int | None" = None) -> None:
        self.out_dir = out_dir
        self.events_per_doc = events_per_doc
        self.__name__ = "parquet_sink_writer"

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        import os
        import uuid

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..stages.assemble import EVENT_SCHEMA, PARTIAL_SCHEMA

        if "partial" in batch.column_names:
            mask = pc.is_valid(batch.column("partial"))
            partials = batch.filter(mask)
            full = batch.filter(pc.invert(mask)).select(EVENT_SCHEMA.names)
        else:  # merged events coming back through the writer
            partials = PARTIAL_SCHEMA.empty_table()
            full = batch.select(EVENT_SCHEMA.names)
        for sink in full.column("sink").unique().to_pylist():
            sub = full.filter(pc.equal(full.column("sink"), sink))
            # hive layout: the sink column lives in the directory name
            sub = sub.drop_columns(["sink"])
            d = os.path.join(self.out_dir, f"sink={sink}")
            os.makedirs(d, exist_ok=True)
            step = max(1, self.events_per_doc or sub.num_rows)
            for lo in range(0, sub.num_rows, step):
                uid = uuid.uuid4().hex
                tmp = os.path.join(d, f".part-{uid}.tmp")
                pq.write_table(sub.slice(lo, step), tmp)
                os.replace(tmp, os.path.join(d, f"part-{uid}.parquet"))
        return partials


def _footer_counts(out_dir: str) -> dict[str, int]:
    """Per-sink row counts from parquet footers only — no data scan."""
    import glob

    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    for sink in SINKS:
        n = 0
        for f in glob.glob(f"{out_dir}/sink={sink}/*.parquet"):
            n += pq.ParquetFile(f).metadata.num_rows
        if n:
            counts[sink] = n
    return counts


def write_routed(events: "ray.data.Dataset", out_dir: str,
                 cfg: PipelineConfig = PipelineConfig()) -> dict[str, int]:
    """Fan-out write: one parquet directory per sink (S2-S4 analogue).

    ONE execution of the upstream pipeline: a hive-partitioned write on the
    `sink` column produces `out_dir/sink=<name>/...` directories (distinct
    directories = resumable units).  Per-sink counts are then read from
    parquet footers only — no data scan, no re-execution.

    events_per_doc maps to max_rows_per_file — the reference's
    events-per-doc is an UPPER bound per document (doc closes when the
    count is hit, lib/conv.c:121-125).  min_rows_per_file must not be used
    here: it coalesces on the operator's INPUT row counts, which collapses
    the contiguous path (32 one-row path blocks) into a single write task.

    Salted side-channel: when `events` is a deferred-merge salted build
    (build_events(..., defer_partial_merge=True) with hot conversations),
    finished events are written to the sink dirs IN-STREAM by
    ParquetSinkWriter and only the partial rows — n_salts per hot
    conversation — take the second groupby; the merged hot events then
    pass through the same writer.  No materialization anywhere.
    """
    import os
    import shutil

    # remove ONLY the sink=... partition dirs a previous run of this writer
    # created — write_parquet appends uuid-named files, so a rerun into the
    # same out_dir would otherwise double-count stale generations
    for sink in SINKS:
        d = os.path.join(out_dir, f"sink={sink}")
        if os.path.isdir(d):
            shutil.rmtree(d)

    if getattr(events, "_aushape_has_partials", False):
        from ..stages.assemble import make_merge_partials

        partials = events.map_batches(
            ParquetSinkWriter(out_dir, cfg.events_per_doc),
            batch_format="pyarrow")
        merged = partials.groupby("conv_id").map_groups(
            make_merge_partials(cfg.with_text, cfg.with_norm,
                                cfg.max_event_size),
            batch_format="pyarrow")
        leftover = merged.map_batches(
            ParquetSinkWriter(out_dir, cfg.events_per_doc),
            batch_format="pyarrow")
        n_left = leftover.count()  # drives the whole plan, exactly once
        assert n_left == 0, f"{n_left} partial rows survived the merge"
        return _footer_counts(out_dir)

    events.write_parquet(
        out_dir, partition_cols=["sink"], max_rows_per_file=cfg.events_per_doc,
    )
    return _footer_counts(out_dir)
