"""CLI entry (S5 analogue — /root/reference/src/aushape.c:121-226 and
lib/conf.c:175-415): convert a transcript parquet directory into routed
event-document parquet sinks.

    python -m aushape_ray INPUT_DIR OUT_DIR [options]

Options mirror the reference CLI surface: --with-norm (aushape
--with-norm), --no-text (inverse of --with-text), --max-event-size
(trim cap, min 1024), --events-per-doc (rows per output file),
--num-parts (shuffle partitions), --resume (per-shard manifest
checkpointing), --shuffle sort|hash, --contiguous (opt into the
shuffle-free per-shard fast path).

Owns the Ray session (guarded, local); library code never ray.inits.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_init_kwargs(addr: str, num_cpus: "int | None") -> dict:
    """ray.init kwargs for the CLI: own a local instance (num_cpus legal)
    when addr is 'local'; otherwise attach to the cluster `ray job
    submit` / RAY_ADDRESS provides, where num_cpus must not be passed —
    the cluster sizes itself."""
    kw = {"address": addr, "include_dashboard": False,
          "logging_level": "ERROR"}
    if addr == "local":
        kw["num_cpus"] = num_cpus
    return kw


def _size(v: str) -> int:
    # k/m suffix handling, like aushape_conf_load (lib/conf.c:272-300)
    m = {"k": 1024, "m": 1024 * 1024}
    if v and v[-1].lower() in m:
        return int(v[:-1]) * m[v[-1].lower()]
    return int(v)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="aushape_ray")
    ap.add_argument("input_dir", help="directory of transcript parquet "
                    "shards (or raw audit.log files with --input-format "
                    "rawlog)")
    ap.add_argument("out_dir", help="output directory (per-sink parquet)")
    ap.add_argument("--with-norm", action="store_true")
    ap.add_argument("--no-text", action="store_true")
    ap.add_argument("--max-event-size", type=_size, default=None)
    ap.add_argument("--events-per-doc", type=int, default=50_000)
    ap.add_argument("--num-parts", type=int, default=64)
    ap.add_argument("--salt-threshold", type=int, default=None,
                    help="split conversations longer than this over "
                         "multiple partitions (salted-key skew handling)")
    ap.add_argument("--shuffle", choices=["sort", "hash"], default="sort")
    ap.add_argument("--input-format",
                    choices=["parquet", "rawlog", "jsonl", "csv"],
                    default="parquet",
                    help="rawlog: raw auditd text lines (node=/type= "
                    "msg=audit(ts:serial) framing), one task per file; "
                    "jsonl: one JSON transcript row per line")
    ap.add_argument("--format", choices=["parquet", "jsonl", "xml", "syslog"],
                    default="parquet",
                    help="sink format: parquet (continuous, S3 analogue), "
                         "jsonl / xml (discrete one-doc-per-line, S4 "
                         "analogue), syslog (jsonl with an RFC3164 <PRI> "
                         "prefix per message)")
    ap.add_argument("--fold", default="all",
                    help="fold nesting level into single line: 0/'all' "
                         "(compact, default here), N, or 'none' (unfold "
                         "fully); reference default is 4 (lib/conf.c:183). "
                         "Applies to jsonl/xml sinks")
    ap.add_argument("--indent", type=int, default=4,
                    help="spaces per nesting level when unfolded")
    ap.add_argument("--syslog-facility", default="authpriv",
                    help="facility name for --format syslog")
    ap.add_argument("--syslog-priority", default="info",
                    help="priority name for --format syslog")
    ap.add_argument("--resume", action="store_true",
                    help="per-shard manifests; rerun skips finished shards")
    ap.add_argument("--follow", action="store_true",
                    help="continuous tailing ingest (audispd live-mode "
                         "analogue): poll INPUT_DIR and process newly "
                         "appeared / changed rotations incrementally via "
                         "the --resume manifest machinery; stop via "
                         "--stop-file / --idle-timeout / --max-polls")
    ap.add_argument("--poll-interval", type=float, default=1.0,
                    help="--follow: seconds between input_dir polls")
    ap.add_argument("--idle-timeout", type=float, default=None,
                    help="--follow: stop after this many seconds without "
                         "new work")
    ap.add_argument("--max-polls", type=int, default=None,
                    help="--follow: stop after this many poll cycles")
    ap.add_argument("--stop-file", default=None,
                    help="--follow: stop when this file appears")
    ap.add_argument("--contiguous", action="store_true",
                    help="use the shuffle-free per-shard fast path; REQUIRES "
                         "that no conversation spans input files (guarded by "
                         "a parquet-footer range check). Default is the "
                         "general conv_id-shuffle path, correct for any "
                         "layout.")
    ap.add_argument("--validate", action="store_true",
                    help="validate every written document against the "
                         "normative schema (aushape.schema.json contract); "
                         "reports n_docs / n_invalid")
    ap.add_argument("--stats", action="store_true",
                    help="print the Ray Data execution stats of the event "
                         "pipeline to stderr after the run (per-operator "
                         "wall/cpu times — the per-stage tuning feedback)")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--curate", action="store_true",
                    help="run the corpus-curation pipeline instead of the "
                         "event pipeline: INPUT_DIR must contain "
                         "documents.parquet; writes kept/ + _rejects/ + "
                         "_manifests/ under OUT_DIR (quality/lang gate, "
                         "exact + near-dup dedup, Bloom decontamination, "
                         "PII redaction; --resume = stage-level skip)")
    args = ap.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        ray.init(**_ray_init_kwargs(
            os.environ.get("RAY_ADDRESS", "local"), args.num_cpus))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import PipelineConfig

    cfg = PipelineConfig(
        with_text=not args.no_text, with_norm=args.with_norm,
        max_event_size=args.max_event_size,
        events_per_doc=args.events_per_doc, num_parts=args.num_parts,
        shuffle=args.shuffle, salt_threshold=args.salt_threshold,
    )

    if args.curate:
        from .pipelines.curation import curate_corpus

        res = curate_corpus(args.input_dir, args.out_dir,
                            resume=args.resume)
        print(json.dumps(res))
        ray.shutdown()
        return 0

    if args.follow:
        from .state.manifest import run_follow

        res = run_follow(args.input_dir, args.out_dir, cfg,
                         input_format=args.input_format,
                         poll_interval=args.poll_interval,
                         idle_timeout=args.idle_timeout,
                         max_polls=args.max_polls,
                         stop_file=args.stop_file)
        print(json.dumps(res))
        ray.shutdown()
        return 0

    if args.resume:
        from .state.manifest import run_resumable

        if args.stats:
            print("--stats: not applicable with --resume (per-shard tasks, "
                  "no single Dataset plan); see the per-shard manifests for "
                  "timings", file=sys.stderr)
        res = run_resumable(args.input_dir, args.out_dir, cfg,
                    input_format=args.input_format)
        print(json.dumps(res))
    else:
        import ray.data

        from .pipelines.events_pipeline import (
            build_events as _build_events,
            write_routed,
        )

        # salted parquet runs use the side-channel write path: finished
        # events stream straight to sink files, only partial rows take the
        # second groupby (stats/validate need the merged EVENT_SCHEMA
        # dataset, so they keep the in-plan merge)
        defer = (args.format == "parquet" and bool(args.salt_threshold)
                 and not args.stats and not args.validate)

        def build_events(ds, cfg):
            return _build_events(ds, cfg, defer_partial_merge=defer)

        if args.input_format == "jsonl":
            from .pipelines.events_pipeline import _configure_shuffle
            from .sources.jsonl import read_transcripts_jsonl

            _configure_shuffle(cfg)
            events = build_events(read_transcripts_jsonl(args.input_dir), cfg)
        elif args.input_format == "csv":
            from .pipelines.events_pipeline import _configure_shuffle
            from .sources.csvsrc import read_transcripts_csv

            _configure_shuffle(cfg)
            events = build_events(read_transcripts_csv(args.input_dir), cfg)
        elif args.input_format == "rawlog":
            import glob as _glob
            import os as _os

            from .pipelines.events_pipeline import _configure_shuffle
            from .sources.rawlog import read_audit_log

            _configure_shuffle(cfg)
            files = sorted(
                f for f in _glob.glob(_os.path.join(args.input_dir, "*"))
                if _os.path.isfile(f))
            events = build_events(read_audit_log(files), cfg)
        elif args.contiguous:
            from .pipelines.events_pipeline import events_from_shards
            from .state.manifest import find_shards

            events = events_from_shards(find_shards(args.input_dir), cfg)
        else:
            # the Dataset snapshots DataContext at creation, so the shuffle
            # strategy must be selected BEFORE read_parquet (same ordering
            # as read_transcripts) or --shuffle would be silently ignored
            from .pipelines.events_pipeline import _configure_shuffle

            _configure_shuffle(cfg)
            ds = ray.data.read_parquet(args.input_dir)
            events = build_events(ds, cfg)
        if args.stats:
            # execute the event pipeline NOW so stats() reflects it on
            # every output format (the jsonl/xml writers execute derived
            # datasets, which would leave the events plan unexecuted and
            # stats() empty); downstream consumers reuse the result
            events = events.materialize()
        validation = None
        if args.validate:
            import pyarrow as pa

            from .schema import validate_doc
            check_xml = args.format == "xml"

            def vcheck(batch: "pa.Table") -> "pa.Table":
                n_bad = 0
                for d in batch.column("doc").to_pylist():
                    doc = json.loads(d)
                    if validate_doc(doc):
                        n_bad += 1
                        continue
                    if check_xml:
                        # structural XSD-port check of the rendered XML
                        # form (aushape_ray/xsd.py); ctrl-char docs use
                        # numeric refs that XML 1.0 parsers reject — by
                        # design, skip those (see test_xml_and_sinks)
                        from .xmlout import render_event_xml
                        from .xsd import validate_event_xml

                        xml = render_event_xml(doc)
                        try:
                            validate_event_xml(xml)
                        except Exception:
                            if "&#x" not in xml:
                                n_bad += 1
                return pa.table({
                    "n_docs": pa.array([batch.num_rows], pa.int64()),
                    "n_invalid": pa.array([n_bad], pa.int64()),
                })

            events = events.materialize()  # shared by validate + write
            from ray.data.aggregate import Sum

            agg = events.map_batches(vcheck, batch_format="pyarrow").aggregate(
                Sum("n_docs", alias_name="n_docs"),
                Sum("n_invalid", alias_name="n_invalid"))
            validation = {"n_docs": int(agg["n_docs"] or 0),
                          "n_invalid": int(agg["n_invalid"] or 0)}
        if args.format == "parquet":
            counts = write_routed(events, args.out_dir, cfg)
        else:
            from .foldout import FoldFormat, parse_fold
            from .pipelines.events_pipeline import write_jsonl_routed

            fmt = FoldFormat(fold_level=parse_fold(args.fold),
                             nest_indent=args.indent)
            pri = None
            if args.format == "syslog":
                from .syslogconf import pri_value

                pri = pri_value(args.syslog_facility, args.syslog_priority)
            counts = write_jsonl_routed(events, args.out_dir,
                                        xml=(args.format == "xml"),
                                        fmt=fmt, pri=pri)
        out = {"sink_counts": counts}
        if validation is not None:
            out["validation"] = validation
        if args.stats:
            print(events.stats(), file=sys.stderr)
        print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
