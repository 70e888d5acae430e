"""Sequence packing: greedy next-fit of documents into fixed-token-budget
training contexts.

The canonical last-mile op of an LLM data pipeline: after curation, docs
are concatenated into fixed-length contexts (e.g. 2048/4096 tokens) so no
padding is wasted.  At corpus scale packing is done PER SHARD, never
globally — global packing would serialize the whole corpus through one
consumer, and training only needs each context to be dense, not for pack
ids to be globally contiguous.  The distributed shape here mirrors that:
docs hash-partition to P shards, each shard packs independently in
deterministic (doc_id) order, pack ids are (shard, local_idx) pairs.

Scale: the per-shard state is one int64 cumsum over that shard's token
counts — 16 bytes/doc, so a 10^10-doc corpus at P=65536 shards holds
~2.4 MB per shard task.  The pack-assignment loop runs one searchsorted
per PACK (not per doc): O(n_packs * log n_docs) interpreter work.
"""

from __future__ import annotations

import numpy as np

__all__ = ["next_fit_pack", "pack_summary", "chunk_plan", "chunk_texts"]


def next_fit_pack(tokens: np.ndarray, capacity: int) -> np.ndarray:
    """Greedy next-fit pack assignment over docs in the given order.

    Returns an int64 pack index per doc.  A pack is closed as soon as the
    next doc would push it past `capacity`; a doc that alone exceeds
    `capacity` gets a pack of its own (the oversize pack — real pipelines
    then chunk it downstream; we keep it intact so token counts are
    conserved and the parity oracle stays exact).
    """
    t = np.asarray(tokens, dtype=np.int64)
    n = len(t)
    out = np.empty(n, np.int64)
    if n == 0:
        return out
    csum = np.cumsum(t)
    start = 0
    pack = 0
    while start < n:
        base = csum[start - 1] if start else 0
        # largest prefix whose running total stays within capacity
        end = int(np.searchsorted(csum, base + capacity, side="right"))
        if end == start:  # single doc larger than capacity
            end = start + 1
        out[start:end] = pack
        pack += 1
        start = end
    return out


def pack_summary(doc_ids: np.ndarray, tokens: np.ndarray,
                 capacity: int) -> dict:
    """Pack one shard (already ordered) and aggregate per-pack stats.

    Returns columns: pack_id, n_docs, n_tokens, first_doc_id.
    """
    t = np.asarray(tokens, dtype=np.int64)
    ids = np.asarray(doc_ids, dtype=np.int64)
    packs = next_fit_pack(t, capacity)
    if len(t) == 0:
        empty = np.empty(0, np.int64)
        return {"pack_id": empty, "n_docs": empty,
                "n_tokens": empty, "first_doc_id": empty}
    # packs is sorted (0,0,...,1,1,...): segment boundaries via diff
    bounds = np.flatnonzero(np.diff(packs)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(t)]))
    csum = np.concatenate(([0], np.cumsum(t)))
    return {
        "pack_id": packs[starts],
        "n_docs": (ends - starts).astype(np.int64),
        "n_tokens": csum[ends] - csum[starts],
        "first_doc_id": ids[starts],
    }


def chunk_plan(docs, chunk_tokens: int = 256,
               n_parts: int = 32):
    """Fixed-block causal-LM chunking plan (GPT-style: documents
    concatenated in doc_id order, the token stream sliced into
    chunk_tokens blocks that CROSS document boundaries — the complement
    of next_fit_pack, which never crosses).  Returns one row per chunk:
    (chunk_idx, start_doc, start_off) — the document containing the
    chunk's first token and that token's offset within the document.

    Distributed shape — prefix scan with carry, no global sort and no
    sequential pass (same pattern as windows.late_event_stats):
      1. one stateless pass counts tokens per doc (Arrow RE2 \\S+) and
         range-partitions by doc_id VALUE (order-preserving);
      2. per-range token sums: P ints to the driver, exclusive cumsum
         -> per-range carries, broadcast back;
      3. ONE exchange of 16-byte (doc_id, n) rows groups each range;
         within a range the chunk starts are fully vectorized (cumsum
         seeded with the carry; per-doc chunk-start counts via integer
         ceil; repeat/arange expansion).
    The exchange carries doc COUNTS, never text — wire volume is
    16 bytes/doc regardless of document size.

    Skew note: value-range partitioning assumes dense doc_ids (true for
    surrogate keys); a skewed id space needs sampled range bounds.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray  # noqa: F401

    C = int(chunk_tokens)

    def counts(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if text.null_count:
            text = text.fill_null("")
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
        })

    tok = docs.map_batches(counts, batch_format="pyarrow")

    lohi = tok.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t.column("doc_id")).as_py()], pa.int64()),
            "hi": pa.array([pc.max(t.column("doc_id")).as_py()], pa.int64()),
        }), batch_format="pyarrow").take_all()
    lo = min(r["lo"] for r in lohi)
    hi = max(r["hi"] for r in lohi)
    span = max(hi - lo + 1, 1)

    def add_part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        part = ((ids - lo) * n_parts // span).astype(np.int64)
        return t.append_column("part", pa.array(part, pa.int64()))

    parted = tok.map_batches(add_part, batch_format="pyarrow").materialize()

    # pass 1: per-range token sums (<= n_parts rows per batch)
    def range_sum(t: pa.Table) -> pa.Table:
        part = t.column("part").to_numpy(zero_copy_only=False)
        n = t.column("n").to_numpy(zero_copy_only=False)
        out_p, out_s = [], []
        for p in np.unique(part):
            out_p.append(int(p))
            out_s.append(int(n[part == p].sum()))
        return pa.table({"part": pa.array(out_p, pa.int64()),
                         "s": pa.array(out_s, pa.int64())})

    sums = parted.map_batches(range_sum, batch_format="pyarrow").take_all()
    per_range = np.zeros(n_parts, np.int64)
    for r in sums:
        per_range[r["part"]] += r["s"]
    carry = np.concatenate([[0], np.cumsum(per_range)[:-1]])  # exclusive

    def emit_chunks(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        ids, n = ids[order], n[order]
        before = carry[p] + np.concatenate([[0], np.cumsum(n)[:-1]])
        # chunk starts landing inside doc i: k*C in [before_i, before_i+n_i)
        k0 = -(-before // C)  # ceil
        k1 = -(-(before + n) // C) - 1
        cnt = np.maximum(k1 - k0 + 1, 0)
        doc_rep = np.repeat(ids, cnt)
        base = np.repeat(k0, cnt)
        step = np.arange(cnt.sum()) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt)
        k = base + step
        off = k * C - np.repeat(before, cnt)
        return pa.table({
            "chunk_idx": pa.array(k.astype(np.int64), pa.int64()),
            "start_doc": pa.array(doc_rep.astype(np.int64), pa.int64()),
            "start_off": pa.array(off.astype(np.int64), pa.int64()),
        })

    emit_chunks.__name__ = "emit_chunks"
    return parted.groupby("part", num_partitions=n_parts).map_groups(
        emit_chunks, batch_format="pyarrow")


def chunk_texts(docs, chunk_tokens: int = 256, n_parts: int = 32):
    """Materialized fixed-block LM chunks: the chunk_plan boundaries
    APPLIED — every 256-token block's actual payload, assembled across
    document boundaries.  Returns (chunk_idx, n_tokens, chunk_md5) —
    the md5 is over the space-joined token stream of the chunk, so the
    full reassembled bytes are oracle-checkable without shipping chunk
    text to the driver.

    Distributed shape: the chunk_plan carry machinery positions every
    document's token stream globally (two cheap count passes: P ints to
    the driver), then ONE range exchange ships each document's text to
    its doc-range group, which splits it into per-chunk FRAGMENTS
    (contiguous token runs), and ONE chunk-range exchange delivers all
    fragments of a chunk to one task for ordered assembly.  Text moves
    exactly twice (doc-range + fragment exchange) — the unavoidable
    payload motion for boundary-crossing chunks; everything else is
    integer rows.  Tokenization is re.findall(r"\\S+") per doc inside
    the group task: the work is inherently per-token string assembly,
    O(total tokens), not a vectorizable fixed-width kernel.
    """
    import hashlib
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    C = int(chunk_tokens)
    word = re.compile(r"\S+")

    def counts(t: pa.Table) -> pa.Table:
        text = t.column("text")
        if text.null_count:
            text = text.fill_null("")
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
        })

    tok = docs.map_batches(counts, batch_format="pyarrow")
    lohi = tok.map_batches(
        lambda t: pa.table({
            "lo": pa.array([pc.min(t.column("doc_id")).as_py()], pa.int64()),
            "hi": pa.array([pc.max(t.column("doc_id")).as_py()], pa.int64()),
        }), batch_format="pyarrow").take_all()
    lo = min(r["lo"] for r in lohi)
    hi = max(r["hi"] for r in lohi)
    span = max(hi - lo + 1, 1)

    def part_of(ids: np.ndarray) -> np.ndarray:
        return ((ids - lo) * n_parts // span).astype(np.int64)

    def range_sum(t: pa.Table) -> pa.Table:
        part = part_of(t.column("doc_id").to_numpy(zero_copy_only=False))
        n = t.column("n").to_numpy(zero_copy_only=False)
        out_p, out_s = [], []
        for p in np.unique(part):
            out_p.append(int(p))
            out_s.append(int(n[part == p].sum()))
        return pa.table({"part": pa.array(out_p, pa.int64()),
                         "s": pa.array(out_s, pa.int64())})

    sums = tok.map_batches(range_sum, batch_format="pyarrow").take_all()
    per_range = np.zeros(n_parts, np.int64)
    for r in sums:
        per_range[r["part"]] += r["s"]
    carry = np.concatenate([[0], np.cumsum(per_range)[:-1]])
    total = int(per_range.sum())
    n_chunks = max(-(-total // C), 1)

    def tag_part(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": t.column("text").cast(pa.string()),
            "part": pa.array(part_of(ids), pa.int64()),
        })

    def fragments(g: pa.Table) -> pa.Table:
        p = int(g.column("part")[0].as_py())
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        texts = g.column("text").to_pylist()
        order = np.argsort(ids)
        pos = carry[p]
        o_k, o_ord, o_frag, o_n = [], [], [], []
        for i in order:
            toks = word.findall(texts[i] or "")
            j = 0
            while j < len(toks):
                take = min(C - pos % C, len(toks) - j)
                o_k.append((pos // C))
                o_ord.append(pos)
                o_frag.append(" ".join(toks[j:j + take]))
                o_n.append(take)
                j += take
                pos += take
        ka = np.asarray(o_k, np.int64) if o_k else np.array([], np.int64)
        return pa.table({
            "k": pa.array(ka, pa.int64()),
            "ord": pa.array(o_ord, pa.int64()),
            "frag": pa.array(o_frag, pa.string()),
            "nt": pa.array(o_n, pa.int64()),
            "kpart": pa.array(ka * n_parts // n_chunks, pa.int64()),
        })

    fragments.__name__ = "chunk_fragments"

    def assemble(g: pa.Table) -> pa.Table:
        k = g.column("k").to_numpy(zero_copy_only=False)
        o = g.column("ord").to_numpy(zero_copy_only=False)
        frag = g.column("frag").to_pylist()
        nt = g.column("nt").to_numpy(zero_copy_only=False)
        order = np.lexsort((o, k))
        k2, nt2 = k[order], nt[order]
        bounds = np.flatnonzero(np.concatenate([[True], k2[1:] != k2[:-1]]))
        out_k, out_n, out_md5 = [], [], []
        for s, e in zip(bounds.tolist(),
                        np.append(bounds[1:], len(k2)).tolist()):
            joined = " ".join(frag[order[i]] for i in range(s, e))
            out_k.append(int(k2[s]))
            out_n.append(int(nt2[s:e].sum()))
            out_md5.append(hashlib.md5(joined.encode()).hexdigest())
        return pa.table({
            "chunk_idx": pa.array(out_k, pa.int64()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "chunk_md5": pa.array(out_md5, pa.string()),
        })

    assemble.__name__ = "chunk_assemble"
    parted = docs.map_batches(tag_part, batch_format="pyarrow")
    frags = parted.groupby("part", num_partitions=n_parts).map_groups(
        fragments, batch_format="pyarrow")
    return frags.groupby("kpart", num_partitions=n_parts).map_groups(
        assemble, batch_format="pyarrow")
