"""Salted-skew stress (verdict r4 item 2 'done' bar): one conversation
holds ~10% of all turns; the salted path must beat the unsalted path on
wall-clock while producing identical events.

Construction: the deterministic fixture corpus plus ONE hot conversation
whose turn count is ~10% of the total.  Unsalted, that conversation pins a
single assemble partition (a serial straggler); salted (threshold +
n_salts), its contiguous turn ranges assemble in parallel and the n_salts
partial rows merge in a tiny second groupby.  Three variants timed:

  unsalted       build_events(cfg w/o salt)         -> take_all
  salted         build_events(cfg w/ salt)          -> take_all (merge-or-pass)
  salted+sink    defer_partial_merge + write_routed -> footer counts
                 (the in-stream side-channel: finished events never enter
                 a second exchange)

Run exclusively on a quiet host; results go to ROUND5.md / BASELINE.md.

Usage: python scripts/stress_skew.py [--n-turns 2400000] [--cpus 32]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa


def build_corpus(n_turns: int) -> "tuple[pa.Table, int]":
    """Synthesize n_turns directly (the fixture generator is too slow for
    multi-million-turn stress corpora): 90% of turns spread over small
    24-turn conversations, 10% in ONE hot conversation.  Texts are
    audit-style k=v MSG/AVC records (both paths run the same collector
    code; identical output is asserted, not assumed)."""
    n_hot = n_turns // 10
    n_base = n_turns - n_hot
    conv_small = 24
    base_conv = np.char.add("conv-",
                            (np.arange(n_base) // conv_small).astype("U10"))
    conv = np.concatenate([base_conv, np.full(n_hot, "conv-hot", "U12")])
    turn = np.concatenate([np.arange(n_base) % conv_small,
                           np.arange(n_hot)]).astype(np.int32)
    seq = np.concatenate([np.arange(n_base), np.arange(n_hot)])
    kind = np.where(seq % 3 == 0, "MSG", "AVC")
    texts = np.char.add(
        np.char.add(np.char.add("node=h9 type=", kind), " seq="),
        seq.astype("U10"))
    texts = np.char.add(texts, np.char.add(" uid=", (seq % 50).astype("U3")))
    role = np.where(seq % 3 == 0, "user", "tool")
    tool = np.where(seq % 3 == 0, "", "stress")
    return pa.table({
        "conv_id": pa.array(conv.tolist(), pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(role.tolist(), pa.string()),
        "text": pa.array(texts.tolist(), pa.string()),
        "tool": pa.array(tool.tolist(), pa.string()),
        "ts": pa.array(np.arange(1, n_turns + 1, dtype=np.int64),
                       pa.timestamp("us")),
    }), n_hot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-turns", type=int, default=2_400_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--n-salts", type=int, default=64)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import (build_events,
                                                       write_routed)

    table, n_hot = build_corpus(args.n_turns)
    print(f"corpus: {table.num_rows} turns, hot conv = {n_hot} "
          f"({n_hot * 100.0 / table.num_rows:.1f}%)", file=sys.stderr)

    def run(salted: bool, sink: bool = False) -> "tuple[float, dict]":
        cfg = PipelineConfig(
            num_parts=4 * args.cpus,
            salt_threshold=1000 if salted else None,
            n_salts=args.n_salts)
        t0 = time.perf_counter()
        # many input blocks (the corpus arrives as one Table; a single
        # block would serialize the parse stage on both paths)
        n_blocks = 8 * args.cpus
        step = max(1, table.num_rows // n_blocks + 1)
        ds = ray.data.from_arrow(
            [table.slice(i, step) for i in range(0, table.num_rows, step)])
        if sink:
            ev = build_events(ds, cfg, defer_partial_merge=True)
            counts = write_routed(ev, "/tmp/stress_skew_out", cfg)
            dt = time.perf_counter() - t0
            return dt, {"counts": counts}
        rows = build_events(ds, cfg).take_all()
        dt = time.perf_counter() - t0
        hot_doc = next(r["doc"] for r in rows if r["conv_id"] == "conv-hot")
        return dt, {"n_events": len(rows), "hot_doc_sha": hash(hot_doc)}

    # warm-up (actor/worker start, fixture codegen) then min-of-2 per mode
    run(False)
    results = {}
    docs = {}
    for name, kw in (("unsalted", dict(salted=False)),
                     ("salted", dict(salted=True)),
                     ("salted_sink", dict(salted=True, sink=True))):
        best, meta = min((run(**kw) for _ in range(2)), key=lambda x: x[0])
        results[name] = round(best, 3)
        docs[name] = meta
        print(f"{name}: {best:.3f}s {meta if 'counts' in meta else ''}",
              file=sys.stderr)

    assert docs["unsalted"]["n_events"] == docs["salted"]["n_events"]
    assert docs["unsalted"]["hot_doc_sha"] == docs["salted"]["hot_doc_sha"], \
        "salted/unsalted hot-conversation docs diverge"
    speedup = results["unsalted"] / results["salted"]
    print(json.dumps({
        "metric": "salted-skew stress (one conv ~10% of turns)",
        "n_turns": table.num_rows, "hot_turns": n_hot,
        "cpus": args.cpus, "n_salts": args.n_salts,
        "sec": results, "salted_speedup_x": round(speedup, 3),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
