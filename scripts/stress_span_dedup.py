"""Duplication-heavy span_dedup stress (committed, reproducible).

Construction: 20 copies of every sf0.1 document (copy 0 original;
copies 1..19 re-prefixed with a distinct 16-word preamble so the copies
are NOT exact-doc dups, but every aligned 16-word span after the
preamble duplicates the original's spans).  With 5k base docs that is
100k docs / ~37M words, ~95% of spans duplicated — the worst case for
the loser side (it approaches corpus size) and for keep-first group
sizes (every span group has ~20 members).

Checks: conservation (sum n_spans == exploded span count), removal rate,
wall time per stage-equivalent run.  Run exclusively on a quiet host;
results go to BASELINE.md.

Usage: python scripts/stress_span_dedup.py [--sf-dir /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def build_corpus(sf_dir: str, copies: int = 20) -> pa.Table:
    import pyarrow.parquet as pq

    base = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").cast(pa.int64())
    tabs = []
    for i in range(copies):
        # a 16-word preamble occupies exactly one span, so every later
        # span of the copy aligns with (and duplicates) the original's
        prefix = ("" if i == 0
                  else " ".join([f"pre{i}w{j}" for j in range(16)]) + " ")
        tabs.append(pa.table({
            "doc_id": pc.add(pc.multiply(ids, pa.scalar(copies, pa.int64())),
                             pa.scalar(i, pa.int64())),
            "text": pc.binary_join_element_wise(
                pa.array([prefix] * len(ids), pa.string()),
                base.column("text").cast(pa.string()), ""),
        }))
    return pa.concat_tables(tabs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=20)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from aushape_ray.functions.dedup import span_dedup

    corpus = build_corpus(args.sf_dir, args.copies)
    n_docs = corpus.num_rows
    n_words = int(pc.sum(pc.list_value_length(
        pc.split_pattern(corpus.column("text"), " "))).as_py())
    print(f"corpus: {n_docs} docs, {n_words/1e6:.1f}M words")

    ds = ray.data.from_arrow(corpus).repartition(64).materialize()
    t0 = time.time()
    out = span_dedup(ds, span_words=16).to_pandas()
    dt = time.time() - t0
    total_spans = int(out["n_spans"].sum())
    removed = int(out["n_removed"].sum())
    assert len(out) == n_docs, (len(out), n_docs)
    print(f"span_dedup: {dt:.1f}s  ({total_spans/1e6:.2f}M spans, "
          f"{removed/1e6:.2f}M removed = {100*removed/total_spans:.1f}%, "
          f"{n_words/dt/1e6:.1f}M words/s)")
    # copy-0 docs are the sf originals: they lose only the corpus's own
    # pre-existing duplicate spans (~4-5% of spans at sf0.1 — the same
    # rate span_dedup removes on the raw corpus), never to their copies
    # (copy ids are strictly larger, keep-first favors the original)
    copy0 = out[out.doc_id % args.copies == 0]
    r0 = copy0["n_removed"].sum() / copy0["n_spans"].sum()
    print(f"copy-0 removal rate: {r0:.5f} (expect ~0.05, the corpus's "
          f"own duplicate-span rate; must be far below the ~96% overall)")
    assert r0 < 0.10
    ray.shutdown()


if __name__ == "__main__":
    main()
