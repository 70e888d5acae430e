"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units") — the full
iterative merge loop, extending doc_bpe_pairs (one count round) to an
actual learned merge table.

Scale shape (the classic Sennrich trick, distributed):
- The corpus is word-counted ONCE (per-batch Arrow value_counts ->
  bucket_reduce tree); every later round runs over the DISTINCT-WORD
  table weighted by count — bounded by vocabulary (~10^8 rows at
  100 TB), not corpus size, and it stays a Dataset throughout.
- Each merge round is: vectorized weighted pair-count partials (at most
  distinct-pair rows leave a batch) -> bucket_reduce -> per-bucket
  TOP-1 -> the driver picks the global argmax from n_buckets candidate
  rows (exact: the global max lives in some bucket's top-1) ->
  the 3-int merge rule is applied by a vectorized map_batches pass and
  the new symbol table is materialized as the next round's input (the
  iterative-state shape, same posture as cluster_pairs rounds and
  Lloyd's k-means in ann.py).
- The driver never holds more than the merge table itself (num_merges
  rows) plus n_buckets candidate rows per round.

Symbols are int32: codepoints below _MERGE_BASE, learned merges above
it.  Merge application is greedy leftmost non-overlapping (run-parity
over consecutive match positions), identical to the scalar reference in
tests/test_bpe.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MERGE_BASE = 0x200000  # > max codepoint 0x10FFFF


def word_counts(docs: "ray.data.Dataset",
                n_buckets: int = 8) -> "ray.data.Dataset":
    """Distinct (word, n) Dataset — whitespace-run tokenization (python
    str.split semantics), per-batch Arrow value_counts partials, reduced
    per hash bucket on the Dataset-returning bucket_exchange (the
    distinct-word table never touches the driver)."""
    from .dedup import _mix64, flat_utf8, fnv_segments
    from .joins import bucket_exchange

    def partial(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b.column("text"), "")
        words = pc.list_flatten(pc.utf8_split_whitespace(col))
        words = words.filter(pc.not_equal(words, ""))
        vc = pc.value_counts(words)
        w = vc.field("values")
        n = vc.field("counts")
        data, off, _ = flat_utf8(w)
        h = _mix64(fnv_segments(data, off[:-1], np.diff(off)))
        return pa.table({
            "word": w,
            "n": n.cast(pa.int64()),
            "b": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
        })

    def merge(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = t.select(["word", "n"]).to_pandas()
        df = df.groupby("word", as_index=False)["n"].sum()
        return pa.table({"word": pa.array(df["word"], pa.large_string()),
                         "n": pa.array(df["n"].to_numpy(), pa.int64())})

    return bucket_exchange(docs.map_batches(partial, batch_format="pyarrow"),
                           n_buckets, merge, bucket_col="b")


def _symbolize(b: pa.Table) -> pa.Table:
    """(word, n) -> (symbols: list<int32> of codepoints, n)."""
    w = b.column("word")
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    lens = pc.utf8_length(w).to_numpy(zero_copy_only=False).astype(np.int64)
    joined = "\x00".join(w.to_pylist()) if len(w) else ""
    arr = np.frombuffer(joined.encode("utf-32-le"), "<u4")
    n_words = len(lens)
    total = int(lens.sum())
    # word i occupies [cum_i + i, cum_i + i + lens_i) in the joined array
    # (the +i skips the i NUL separators before it)
    cum = np.concatenate(([0], np.cumsum(lens)))[:-1]
    starts = cum + np.arange(n_words, dtype=np.int64)
    out_start = np.repeat(cum, lens)
    flat_idx = np.repeat(starts, lens) + (np.arange(total) - out_start)
    vals = arr[flat_idx].astype(np.int32) if total else np.array([], np.int32)
    off = np.concatenate(([0], np.cumsum(lens)))
    return pa.table({
        "symbols": pa.LargeListArray.from_arrays(off, pa.array(vals,
                                                               pa.int32())),
        "n": b.column("n"),
    })


def _flat_view(b: pa.Table):
    col = b.column("symbols")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    off = np.asarray(col.offsets, dtype=np.int64)
    vals = col.values.to_numpy(zero_copy_only=False).astype(np.int32,
                                                            copy=False)
    cnt = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    return off, vals, cnt


def _pair_partial(b: pa.Table, n_buckets: int) -> pa.Table:
    off, vals, cnt = _flat_view(b)
    empty = pa.table({"pair": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64())})
    if len(vals) < 2:
        return empty
    word_id = np.repeat(np.arange(len(cnt), dtype=np.int64), np.diff(off))
    ok = word_id[:-1] == word_id[1:]
    if not ok.any():
        return empty
    a = vals[:-1][ok].astype(np.uint64)
    c = vals[1:][ok].astype(np.uint64)
    packed = ((a << np.uint64(32)) | c).astype(np.int64)
    wt = cnt[word_id[:-1][ok]]
    order = np.argsort(packed, kind="stable")
    p_sorted = packed[order]
    first = np.empty(len(p_sorted), bool)
    first[0] = True
    first[1:] = p_sorted[1:] != p_sorted[:-1]
    starts = np.flatnonzero(first)
    pairs = p_sorted[starts]
    sums = np.add.reduceat(wt[order], starts)
    return pa.table({"pair": pa.array(pairs, pa.int64()),
                     "n": pa.array(sums, pa.int64()),
                     "b": pa.array(pairs % n_buckets, pa.int64())})


def _bucket_top1(t: pa.Table) -> pa.Table:
    """Sum partials per pair, return the single best (max n, then min
    pair) row — the only row this bucket contributes to the driver."""
    empty = pa.table({"pair": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    if t.num_rows == 0:
        return empty
    import pandas as pd

    df = (t.select(["pair", "n"]).to_pandas()
          .groupby("pair", as_index=False)["n"].sum()
          .sort_values(["n", "pair"], ascending=[False, True]))
    top = df.head(1)
    return pa.table({"pair": pa.array(top["pair"].to_numpy(), pa.int64()),
                     "n": pa.array(top["n"].to_numpy(), pa.int64())})


def _apply_merge(b: pa.Table, a_id: int, b_id: int,
                 new_id: int) -> pa.Table:
    """Greedy leftmost non-overlapping replacement of (a_id, b_id) ->
    new_id inside every word — one vectorized pass (run-parity resolves
    the a==b overlap chains: in a run of consecutive matches every other
    one fires, exactly Sennrich's left-to-right scan)."""
    off, vals, cnt = _flat_view(b)
    if len(vals) < 2:
        return b
    word_id = np.repeat(np.arange(len(cnt), dtype=np.int64), np.diff(off))
    match = ((vals[:-1] == a_id) & (vals[1:] == b_id)
             & (word_id[:-1] == word_id[1:]))
    m = np.flatnonzero(match)
    if len(m) == 0:
        return b
    run_first = np.empty(len(m), bool)
    run_first[0] = True
    run_first[1:] = np.diff(m) > 1
    run_start = m[run_first]
    run_idx = np.cumsum(run_first) - 1
    in_run = m - run_start[run_idx]
    fire = m[in_run % 2 == 0]
    out_vals = vals.copy()
    out_vals[fire] = new_id
    keep = np.ones(len(vals), bool)
    keep[fire + 1] = False
    out_vals = out_vals[keep]
    removed = np.bincount(word_id[fire], minlength=len(cnt)).astype(np.int64)
    new_off = off - np.concatenate(([0], np.cumsum(removed)))
    return pa.table({
        "symbols": pa.LargeListArray.from_arrays(new_off,
                                                 pa.array(out_vals,
                                                          pa.int32())),
        "n": b.column("n"),
    })


def _best_pair(cand: pa.Table) -> "tuple[int, int]":
    """(packed_pair, n) with the shared tie-break: max n, then min pair."""
    pn = cand.column("n").to_numpy(zero_copy_only=False)
    pp = cand.column("pair").to_numpy(zero_copy_only=False)
    order = np.lexsort((pp, -pn))
    return int(pp[order[0]]), int(pn[order[0]])


def _train_rounds_local(num_merges: int, min_count: int,
                        *tables: pa.Table
                        ) -> "list[tuple[int, int, int, int]]":
    """All merge rounds over ONE in-memory symbol table — the small-vocab
    fast path (same posture as cluster_pairs' single-task union-find
    below 1M edges).  Reuses the exact distributed kernels
    (_pair_partial / _apply_merge), so results are identical by
    construction.  Returns (rank, a_id, b_id, n) rows."""
    live = [t for t in tables if t.num_rows]
    if not live:
        return []
    tbl = pa.concat_tables(live).combine_chunks()
    out = []
    for r in range(num_merges):
        p = _pair_partial(tbl, 1)
        if p.num_rows == 0:
            break
        best_pair, best_n = _best_pair(p)
        if best_n < min_count:
            break
        a_id, b_id = best_pair >> 32, best_pair & 0xFFFFFFFF
        new_id = _MERGE_BASE + r
        out.append((r, a_id, b_id, best_n))
        tbl = _apply_merge(tbl, a_id, b_id, new_id)
    return out


def bpe_train(docs: "ray.data.Dataset", num_merges: int = 16,
              min_count: int = 2, n_buckets: int = 8,
              local_vocab_threshold: int = 1 << 20) -> pa.Table:
    """Learn `num_merges` BPE merges over the corpus; returns the merge
    table (rank, left, right, token, n) — left/right/token as strings,
    n the weighted pair frequency at merge time.  Stops early when the
    best pair's count falls below min_count or no pair remains.

    Scale adaptivity: when the distinct-word table fits one worker
    (< local_vocab_threshold rows) every round's exchange would be pure
    fixed cost, so ALL rounds run in ONE remote task over the collected
    table with the same kernels (~2.2s/round -> ~0.1s/round measured at
    sf0.1); above it each round is the distributed partial-count /
    top-1 / broadcast-apply loop."""
    import ray as _ray

    vocab = word_counts(docs, n_buckets)
    cur = vocab.map_batches(_symbolize, batch_format="pyarrow").materialize()

    sym_str: dict[int, str] = {}

    def to_str(sid: int) -> str:
        return sym_str.get(sid) or chr(sid)

    def emit(rows):
        ranks, lefts, rights, tokens, counts = [], [], [], [], []
        for r, a_id, b_id, n in rows:
            left, right = to_str(a_id), to_str(b_id)
            sym_str[_MERGE_BASE + r] = left + right
            ranks.append(r)
            lefts.append(left)
            rights.append(right)
            tokens.append(left + right)
            counts.append(n)
        return pa.table({
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "token": pa.array(tokens, pa.string()),
            "n": pa.array(counts, pa.int64()),
        })

    if cur.count() < local_vocab_threshold:
        local = _ray.remote(_train_rounds_local)
        rows = _ray.get(local.remote(num_merges, min_count,
                                     *cur.to_arrow_refs()))
        return emit(rows)

    from .joins import bucket_reduce

    rows = []
    for r in range(num_merges):
        parts = bucket_reduce(
            cur.map_batches(lambda t: _pair_partial(t, n_buckets),
                            batch_format="pyarrow"),
            n_buckets, _bucket_top1)
        live = [t for t in parts if t.num_rows]
        if not live:
            break
        best_pair, best_n = _best_pair(pa.concat_tables(live))
        if best_n < min_count:
            break
        a_id = best_pair >> 32
        b_id = best_pair & 0xFFFFFFFF
        new_id = _MERGE_BASE + r
        rows.append((r, a_id, b_id, best_n))
        cur = cur.map_batches(
            lambda t, a=a_id, b=b_id, nid=new_id: _apply_merge(t, a, b, nid),
            batch_format="pyarrow").materialize()
    return emit(rows)


# ---------------- tokenizer application (encode) ---------------------------


def merges_to_ids(merges: pa.Table) -> "list[tuple[int, int, int]]":
    """Recover the (a_id, b_id, new_id) triples from bpe_train's string
    merge table by replaying creation order (single-char symbols are
    always base codepoints; multi-char ones were minted at
    _MERGE_BASE + rank)."""
    sid: dict[str, int] = {}
    out = []
    for rank, left, right, token in zip(
            merges.column("rank").to_pylist(),
            merges.column("left").to_pylist(),
            merges.column("right").to_pylist(),
            merges.column("token").to_pylist()):
        a = sid[left] if left in sid else ord(left)
        b = sid[right] if right in sid else ord(right)
        new_id = _MERGE_BASE + rank
        sid[token] = new_id
        out.append((a, b, new_id))
    return out


def _apply_merge_flat(vals: np.ndarray, seg: np.ndarray, a_id: int,
                      b_id: int, new_id: int):
    """One merge pass over a flat symbol array with a segment-id array
    (merges never cross segment boundaries) — the same greedy leftmost
    run-parity rule as _apply_merge."""
    if len(vals) < 2:
        return vals, seg
    match = ((vals[:-1] == a_id) & (vals[1:] == b_id)
             & (seg[:-1] == seg[1:]))
    m = np.flatnonzero(match)
    if len(m) == 0:
        return vals, seg
    run_first = np.empty(len(m), bool)
    run_first[0] = True
    run_first[1:] = np.diff(m) > 1
    run_start = m[run_first]
    run_idx = np.cumsum(run_first) - 1
    fire = m[(m - run_start[run_idx]) % 2 == 0]
    vals = vals.copy()
    vals[fire] = new_id
    keep = np.ones(len(vals), bool)
    keep[fire + 1] = False
    return vals[keep], seg[keep]


def bpe_encode_counts(docs: "ray.data.Dataset",
                      merges: pa.Table) -> "ray.data.Dataset":
    """Tokenize the corpus with a learned merge table (rank order), one
    stateless vectorized map_batches pass: per batch the texts become one
    flat codepoint array with word segment ids (whitespace-run split,
    training parity), each merge is one vectorized pass, and the result
    is per-document (n_tokens, token_checksum).  The checksum is an
    order-sensitive uint64 (sum over mix64(token ^ mix64(position)))
    so two docs agree iff their token streams agree (mod collisions) —
    cheap to verify against the scalar encoder without shipping token
    streams anywhere.  The merge list is a few hundred ints riding the
    task closure; at a real vocabulary size ray.put it instead."""
    from .dedup import _mix64

    triples = merges_to_ids(merges)

    def encode(b: pa.Table) -> pa.Table:
        col = pc.fill_null(b.column("text"), "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        words_list = pc.utf8_split_whitespace(col)
        if isinstance(words_list, pa.ChunkedArray):
            words_list = words_list.combine_chunks()
        woff = np.asarray(words_list.offsets, dtype=np.int64)
        words = words_list.values
        keep = pc.not_equal(words, "")
        # word -> doc mapping BEFORE dropping empties
        word_doc = np.repeat(np.arange(len(col), dtype=np.int64),
                             np.diff(woff))
        word_doc = word_doc[keep.to_numpy(zero_copy_only=False)]
        words = words.filter(keep)
        doc_ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        n_docs = len(col)
        if len(words) == 0:
            return pa.table({
                "doc_id": b.column("doc_id"),
                "n_tokens": pa.array(np.zeros(n_docs, np.int64)),
                "token_checksum": pa.array(np.zeros(n_docs, np.int64)),
            })
        lens = pc.utf8_length(words).to_numpy(zero_copy_only=False).astype(
            np.int64)
        joined = "\x00".join(words.to_pylist())
        arr = np.frombuffer(joined.encode("utf-32-le"), "<u4")
        cum = np.concatenate(([0], np.cumsum(lens)))[:-1]
        starts = cum + np.arange(len(lens), dtype=np.int64)
        total = int(lens.sum())
        flat_idx = (np.repeat(starts, lens)
                    + (np.arange(total) - np.repeat(cum, lens)))
        vals = arr[flat_idx].astype(np.int32)
        seg = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        for a_id, b_id, new_id in triples:
            vals, seg = _apply_merge_flat(vals, seg, a_id, b_id, new_id)
        tok_doc = word_doc[seg]
        n_tokens = np.bincount(tok_doc, minlength=n_docs).astype(np.int64)
        # order-sensitive checksum: position within doc via running index
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_tokens)))[:-1], n_tokens)
        mixed = _mix64(vals.astype(np.uint64)
                       ^ _mix64(pos.astype(np.uint64)))
        csum = np.zeros(n_docs, np.uint64)
        if len(mixed):
            bounds = np.concatenate(([0], np.cumsum(n_tokens)))[:-1]
            live = n_tokens > 0
            csum[live] = np.add.reduceat(mixed, bounds[live])
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "token_checksum": pa.array(csum.view(np.int64)),
        })

    return docs.map_batches(encode, batch_format="pyarrow")
