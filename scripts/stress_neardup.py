"""Adversarially dense near-dup stress (committed form of the round-2/3
ad-hoc run recorded in BASELINE.md).

Construction: 10 near-identical copies of every sf0.1 document (copy 0 is
the original; copies 1..9 get a distinct short suffix), so every doc has
>= 9 true near-dups and LSH candidate density explodes (~8.7M pairs with
the corpus-scale bucket cap; ~50M uncapped, which spills the sandbox's
disk — the cap is mandatory at this density).

Stages timed separately: candidates (signatures -> bands -> capped pairs,
materialized), verify (bucket-colocated Jaccard), clustering.  Run
exclusively on a quiet host; results go to BASELINE.md.

Usage: python scripts/stress_neardup.py [--sf-dir /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import pyarrow as pa
import pyarrow.compute as pc


def build_corpus(sf_dir: str, copies: int = 10) -> pa.Table:
    import pyarrow.parquet as pq

    base = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").cast(pa.int64())
    tabs = []
    for i in range(copies):
        suffix = "" if i == 0 else f" variant tag {i}"
        tabs.append(pa.table({
            "doc_id": pc.add(pc.multiply(ids, pa.scalar(copies, pa.int64())),
                             pa.scalar(i, pa.int64())),
            "text": pc.binary_join_element_wise(
                base.column("text").cast(pa.string()), suffix, ""),
        }))
    return pa.concat_tables(tabs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--num-cpus", type=int, default=32)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.num_cpus,
             include_dashboard=False, logging_level="ERROR")
    import ray.data
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from aushape_ray.functions.dedup import (
        MAX_BUCKET_PAIRS_N, cluster_pairs, minhash_candidates,
        verify_pairs_jaccard)

    corpus = build_corpus(args.sf_dir, args.copies)
    print(f"corpus: {corpus.num_rows} docs")
    docs = ray.data.from_arrow(corpus).repartition(64).materialize()

    t0 = time.perf_counter()
    cands = minhash_candidates(docs, cap=MAX_BUCKET_PAIRS_N).materialize()
    t1 = time.perf_counter()
    n_cands = cands.count()
    print(f"candidates: {n_cands} pairs in {t1 - t0:.1f}s")

    t1 = time.perf_counter()
    verified = verify_pairs_jaccard(cands, docs, n_buckets=64,
                                    min_jaccard=0.8)
    near = verified.map_batches(
        lambda t: t.filter(pc.greater_equal(t.column("jaccard"), 0.8)),
        batch_format="pyarrow").materialize()
    t2 = time.perf_counter()
    print(f"verify: {near.count()} pairs >= 0.8 in {t2 - t1:.1f}s")

    t2 = time.perf_counter()
    clusters = cluster_pairs(near.select_columns(["doc_a", "doc_b"]))
    n_clustered = clusters.count()
    t3 = time.perf_counter()
    print(f"clusters: {n_clustered} member rows in {t3 - t2:.1f}s")
    print(f"total: {t3 - t0:.1f}s")
    ray.shutdown()


if __name__ == "__main__":
    main()
