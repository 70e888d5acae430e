"""TF-IDF cosine join stress (committed, reproducible).

Construction: 10 copies of every sf0.1 document; every copy of base doc
d carries the same ~len/3 RARE salt terms (df = copies exactly — the
"shared rare content" signature of real near-dups) plus ~len/20
copy-private noise terms (df = 1), while the base words are corpus-wide
(df >> 64) and get df-pruned.  This is the regime the df cap is FOR:
the common-vocabulary mass (the quadratic blowup) is pruned, the rare
intra-clique mass carries the signal.  50k docs, ~7M postings,
~1.8M-term vocabulary.

Checks: every pair found is intra-clique (precision vs construction),
per-clique recall, wall time.

Usage: python scripts/stress_tfidf.py [--sf-dir /root/testdata/sf0.1]
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pyarrow as pa


def build_corpus(sf_dir: str, copies: int = 10) -> pa.Table:
    import pyarrow.parquet as pq

    base = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = base.column("doc_id").to_numpy(zero_copy_only=False)
    texts = base.column("text").to_pylist()
    def alpha(x: int) -> str:
        # digits -> letters: terms must survive the [a-z]+ tokenizer
        return "".join(chr(97 + int(c)) for c in str(x))

    out_id, out_tx = [], []
    for i in range(copies):
        for d, t in zip(ids, texts):
            words = (t or "").split()
            n_salt = max(3, len(words) // 3)
            n_noise = max(1, len(words) // 20)
            salt = [f"qq{alpha(int(d))}x{alpha(j)}" for j in range(n_salt)]
            noise = ([f"zz{alpha(int(d))}c{alpha(i)}x{alpha(j)}"
                      for j in range(n_noise)] if i else [])
            out_id.append(int(d) * copies + i)
            out_tx.append(" ".join(words + salt + noise))
    return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                     "text": pa.array(out_tx, pa.string())})


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.6)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from aushape_ray.functions.textops import tfidf_pairs

    corpus = build_corpus(args.sf_dir, args.copies)
    n_docs = corpus.num_rows
    print(f"corpus: {n_docs} docs")
    ds = ray.data.from_arrow(corpus).repartition(64)

    t0 = time.time()
    pairs = tfidf_pairs(ds, args.threshold, max_df=64,
                        n_parts=64).materialize()
    n_pairs = pairs.count()
    wall = time.time() - t0
    print(f"pairs: {n_pairs} in {wall:.1f}s "
          f"({n_docs / wall:.0f} docs/s)")

    # precision vs construction: a found pair must share the base doc
    import pyarrow.compute as pc

    bad = pairs.map_batches(
        lambda t: pa.table({"bad": pa.array([int(pc.sum(pc.not_equal(
            pc.divide(t.column("doc_a"), args.copies),
            pc.divide(t.column("doc_b"), args.copies))).as_py() or 0)],
            pa.int64())}),
        batch_format="pyarrow").take_all()
    n_bad = sum(r["bad"] for r in bad)
    # recall: fraction of cliques with at least ceil(copies/2) members
    # linked to copy 0 (full C(10,2) recovery is not expected: noise
    # replacement lowers some cosines below threshold by construction)
    linked = pairs.map_batches(
        lambda t: pa.table({
            "base": pc.divide(t.column("doc_a"), args.copies),
            "m": pc.subtract(t.column("doc_b"),
                             pc.multiply(pc.divide(t.column("doc_b"),
                                                   args.copies),
                                         pa.scalar(args.copies,
                                                   pa.int64()))),
        }), batch_format="pyarrow").to_pandas()
    per_base = linked.groupby("base")["m"].nunique()
    n_bases = n_docs // args.copies
    good = int((per_base >= args.copies // 2).sum())
    print(f"cross-clique pairs (must be 0): {n_bad}")
    print(f"cliques with >=half members linked: {good}/{n_bases}")
    assert n_bad == 0
    assert good >= 0.9 * n_bases
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
