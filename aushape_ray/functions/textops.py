"""Text-analysis operators for the documents table (training-data ops).

All stateless vectorized `map_batches` transforms over Arrow batches, or
actor-pool classes where a compiled/loaded state is amortized
(`LangId`).  Counting queries use integer outputs so DuckDB oracle
value-hashes match exactly.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# ASCII punctuation as an explicit class — identical semantics in the
# DuckDB oracle regex.
_PUNCT_CLASS = r"""[!-/:-@\[-`{-~]"""

# tiny per-language stopword marker sets (public common words)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it"},
    "es": {"el", "la", "de", "que", "y", "los", "las", "un"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une"},
    "de": {"der", "die", "und", "das", "ein", "mit", "von", "zu"},
}


# BPE-ish pre-tokenizer (GPT-2 flavoured, simplified to stay RE2-compatible
# for the DuckDB oracle: no lookarounds)
BPE_REGEX = r" ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+"


def token_stats(batch: pa.Table) -> pa.Table:
    """doc_id, n_chars, n_tokens (whitespace), n_bpe_tokens (BPE-ish).

    Match counting runs in Arrow's RE2 (count_substring_regex) — no
    Python-level regex loop, and the engine matches the DuckDB oracle's
    RE2 exactly (the BPE pattern was already written RE2-compatible)."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
        "n_tokens": pc.count_substring_regex(text, r"\S+").cast(pa.int64()),
        "n_bpe_tokens": pc.count_substring_regex(
            text, BPE_REGEX).cast(pa.int64()),
    })


def char_stats(batch: pa.Table) -> pa.Table:
    """doc_id + integer char-class counts (quality-scoring inputs),
    counted by Arrow's RE2 — ASCII classes, identical in both engines."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_upper": pc.count_substring_regex(text, r"[A-Z]").cast(pa.int64()),
        "n_digit": pc.count_substring_regex(text, r"[0-9]").cast(pa.int64()),
        "n_punct": pc.count_substring_regex(
            text, _PUNCT_CLASS).cast(pa.int64()),
    })


def quality_score(batch: pa.Table) -> pa.Table:
    """Heuristic quality: integer components + a 0-100 integer score."""
    import re

    texts = batch.column("text").to_pylist()
    scores, n_words_l, n_stop_l = [], [], []
    stop = _LANG_MARKERS["en"]
    for t in texts:
        words = re.findall(r"[a-zA-Z]+", (t or "").lower())
        n_words = len(words)
        n_stop = sum(w in stop for w in words)
        score = 0
        if n_words >= 5:
            score += 40
        if n_words and 50 * n_stop > n_words:  # ratio > 0.02, exact int math
            score += 30
        if t and len(t) < 10_000:
            score += 30
        scores.append(score)
        n_words_l.append(n_words)
        n_stop_l.append(n_stop)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_words": pa.array(n_words_l, pa.int64()),
        "n_stopwords": pa.array(n_stop_l, pa.int64()),
        "quality": pa.array(scores, pa.int64()),
    })


class LangId:
    """Language-ID by stopword-marker voting (actor pool: word regex and
    marker sets compiled once per actor)."""

    def __init__(self) -> None:
        import re

        self.word = re.compile(r"[a-zà-ÿ]+")
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = []
        for t in batch.column("text").to_pylist():
            words = self.word.findall((t or "").lower())
            best, best_n = "unknown", 0
            for lang in sorted(self.markers):
                n = sum(w in self.markers[lang] for w in words)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, pa.string()),
        })


_FP_B, _FP_M = 257, (1 << 61) - 1


def _poly_hashes(data: np.ndarray, window: int) -> np.ndarray:
    """Vectorized polynomial hashes of every `window`-byte window of `data`
    mod the Mersenne prime 2^61-1.

    data: (n,) uint8.
    Exploits M Mersenne: x*2^61 === x (mod M), so a 61-bit coefficient
    times a byte splits into 32-bit halves with cheap shift folds — no
    Python bigints, value-identical to `(h*B + b) % M` scalar arithmetic.
    Operates on contiguous shifted slices (no strided window matrix).
    """
    M = np.uint64(_FP_M)
    sh29, sh32, sh61 = np.uint64(29), np.uint64(32), np.uint64(61)
    mask29 = np.uint64((1 << 29) - 1)
    n_out = len(data) - window + 1
    data64 = data.astype(np.uint64)  # one contiguous upcast (uint64*uint8
    #                                  promotes to float64 on numpy 1.x)
    acc = np.zeros(n_out, dtype=np.uint64)
    # byte-pair packing: b[2k]*B^(w-1-2k) + b[2k+1]*B^(w-2-2k)
    #   = B^(w-2-2k) * (b[2k]*257 + b[2k+1]);  the packed value v < 2^17,
    # so coeff_hi(29b)*v < 2^46 and coeff_lo(32b)*v < 2^49 both fit.
    # Each pair adds < 2^61.01 to the accumulator, so it must be FOLDED
    # back below 2^61 every 6 pairs — without that, window > ~14 would
    # silently wrap uint64 (each fold is two shifts, mod-M preserving)
    for pair_i, k in enumerate(range(0, window - 1, 2)):
        if pair_i and pair_i % 6 == 0:
            acc = (acc >> sh61) + (acc & M)
        c = pow(_FP_B, window - 2 - k, _FP_M)
        v = data64[k:k + n_out] * np.uint64(257) + data64[k + 1:k + 1 + n_out]
        y = np.uint64(c >> 32) * v
        acc += (y >> sh29) + ((y & mask29) << sh32)
        acc += np.uint64(c & 0xFFFFFFFF) * v
    if window % 2:
        acc += data64[window - 1:window - 1 + n_out]  # coeff B^0 = 1
    acc = (acc >> sh61) + (acc & M)       # <= M + small
    return np.where(acc >= M, acc - M, acc)


def fingerprint(batch: pa.Table, window: int = 8) -> pa.Table:
    """Rolling-hash document fingerprint: min of Rabin-style polynomial
    hashes over byte windows (a winnowing-style representative),
    deterministic.  Fully vectorized: all window hashes of a document are
    one numpy pass over a sliding-window view (value-identical to the
    scalar rolling recurrence, see tests/test_review_fixes.py)."""
    out = []
    for t in batch.column("text").to_pylist():
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
        n = len(data)
        if n < window:
            if n == 0:
                out.append(0)
                continue
            h = _poly_hashes(data, n)
            out.append(int(h[0]))
            continue
        h = _poly_hashes(data, window)
        out.append(int(h.min()))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(out, pa.int64()),
    })


def shared_term_pairs(docs: "ray.data.Dataset", min_shared: int = 10,
                      max_df: int = 50, n_parts: int = 32):
    """Inverted-index candidate join: document pairs sharing >= min_shared
    distinct terms, with document-frequency pruning — the exact sparse
    counterpart of MinHash-LSH candidate generation (classic
    term-partitioned MapReduce self-join).

    Scale shape: postings (term_bucket, term, doc_id) shuffle ONCE by a
    coarse term-hash bucket; every posting of a term lands in the same
    bucket task, so per-term document frequency is computed locally there
    and terms with df < 2 or df > max_df are dropped before any pair is
    emitted (the DF cap is the lever that bounds pair fan-out: a term
    contributes <= C(max_df, 2) pairs).  Pair partials then shuffle by a
    coarse pair-hash partition and sum vectorized.  No driver
    materialization; both exchanges carry only integer/term rows.

    Terms: ASCII [a-z]+ runs of the raw text, deduplicated per document
    — identical to the SQL form unnest(regexp_extract_all(text, '[a-z]+'))
    (no lower(): Unicode case-folding differs subtly between engines).
    Returns (doc_a, doc_b, n_shared), doc_a < doc_b.
    """
    import re

    from .joins import hash_part

    word = re.compile(r"[a-z]+")

    def postings(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_doc: list[int] = []
        o_term: list[str] = []
        for d, t in zip(ids, texts):
            terms = set(word.findall(t or ""))
            o_doc.extend([d] * len(terms))
            o_term.extend(terms)
        tb = np.array([zlib.crc32(s.encode()) for s in o_term],
                      dtype=np.int64) % n_parts
        return pa.table({
            "term_bucket": pa.array(tb, pa.int32()),
            "term": pa.array(o_term, pa.string()),
            "doc_id": pa.array(o_doc, pa.int64()),
        })

    def pairs_in_bucket(g: pa.Table) -> pa.Table:
        import pandas as pd

        term = g.column("term").to_numpy(zero_copy_only=False)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        # per-term posting runs via a factorize + stable sort
        codes, _ = pd.factorize(term)
        order = np.argsort(codes, kind="stable")
        c2, d2 = codes[order], doc[order]
        bounds = np.flatnonzero(
            np.concatenate([[True], c2[1:] != c2[:-1]]))
        counts = np.diff(np.append(bounds, len(c2)))
        o_a: list[np.ndarray] = []
        o_b: list[np.ndarray] = []
        for s, c in zip(bounds.tolist(), counts.tolist()):
            if c < 2 or c > max_df:
                continue  # DF pruning: singleton or stopword-grade term
            ds_ = np.sort(d2[s:s + c])
            iu, ju = np.triu_indices(c, k=1)
            o_a.append(ds_[iu])
            o_b.append(ds_[ju])
        # sentinel row (doc_a = -1, filtered in sum_pairs): guarantees
        # the second groupby always has >= 1 group, so a fully-pruned
        # corpus still yields a SCHEMA-carrying empty result instead of
        # a zero-block dataset with no schema
        o_a.append(np.array([-1], np.int64))
        o_b.append(np.array([-1], np.int64))
        a = np.concatenate(o_a)
        b = np.concatenate(o_b)
        part = hash_part(a * np.int64(1_000_003) + b, n_parts)
        return pa.table({"doc_a": pa.array(a, pa.int64()),
                         "doc_b": pa.array(b, pa.int64()),
                         "part": pa.array(part, pa.int32())})

    pairs_in_bucket.__name__ = "pairs_in_bucket"

    def sum_pairs(g: pa.Table) -> pa.Table:
        a = g.column("doc_a").to_numpy(zero_copy_only=False)
        b = g.column("doc_b").to_numpy(zero_copy_only=False)
        real = a >= 0  # drop the schema-stabilizing sentinel rows
        a, b = a[real], b[real]
        if len(a) == 0:  # sentinel-only partition (fully-pruned corpus)
            return pa.table({"doc_a": pa.array([], pa.int64()),
                             "doc_b": pa.array([], pa.int64()),
                             "n_shared": pa.array([], pa.int64())})
        order = np.lexsort((b, a))
        a2, b2 = a[order], b[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])]))
        n = np.diff(np.append(bounds, len(a2)))
        keep = n >= min_shared
        return pa.table({
            "doc_a": pa.array(a2[bounds][keep], pa.int64()),
            "doc_b": pa.array(b2[bounds][keep], pa.int64()),
            "n_shared": pa.array(n[keep].astype(np.int64), pa.int64()),
        })

    sum_pairs.__name__ = "sum_pairs"
    post = docs.map_batches(postings, batch_format="pyarrow")
    cand = post.groupby("term_bucket", num_partitions=n_parts).map_groups(
        pairs_in_bucket, batch_format="pyarrow")
    return cand.groupby("part", num_partitions=n_parts).map_groups(
        sum_pairs, batch_format="pyarrow")


def tfidf_pairs(docs: "ray.data.Dataset", threshold: float,
                max_df: int = 64, n_parts: int = 32):
    """Sparse TF-IDF cosine similarity join (the classic all-pairs
    similarity search over an inverted index): document pairs with
    cosine(tfidf_a, tfidf_b) >= threshold.

    Semantics (mirrored exactly by the SQL oracle): tf = raw term count
    per (doc, term); idf = ln(N / df); norms are over ALL of a doc's
    terms; the dot product only sums terms with df <= max_df — the cap
    that bounds pair fan-out to C(max_df, 2) per term (df >= 2 is not a
    restriction: df-1 terms can't contribute to any pair).

    Scale shape: postings shuffle ONCE by coarse term bucket; the bucket
    task computes per-term df locally (exact: all postings of a term are
    co-located), weights w = tf*ln(N/df), and emits BOTH presummed pair
    dot partials and per-doc norm partials from the same pass (tagged
    rows, one exchange instead of two).  Pair partials then sum by
    coarse pair partition, norms by doc partition, and two partitioned
    hash joins attach norms to dots.  The threshold test is done on
    squared terms (dot^2 >= t^2 * n2a * n2b) so no sqrt enters either
    engine.  N (one scalar) is the only driver value.
    Returns (doc_a, doc_b), doc_a < doc_b."""
    import re

    from .joins import hash_join, hash_part

    word = re.compile(r"[a-z]+")
    n_docs = docs.count()  # one scalar on the driver
    t2 = threshold * threshold

    def postings(batch: pa.Table) -> pa.Table:
        import collections

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        o_doc: list[int] = []
        o_term: list[str] = []
        o_tf: list[int] = []
        for d, t in zip(ids, texts):
            cnt = collections.Counter(word.findall(t or ""))
            o_doc.extend([d] * len(cnt))
            o_term.extend(cnt.keys())
            o_tf.extend(cnt.values())
        tb = np.array([zlib.crc32(s.encode()) for s in o_term],
                      dtype=np.int64) % n_parts
        return pa.table({
            "term_bucket": pa.array(tb, pa.int32()),
            "term": pa.array(o_term, pa.string()),
            "doc_id": pa.array(o_doc, pa.int64()),
            "tf": pa.array(o_tf, pa.int64()),
        })

    def bucket_pass(g: pa.Table) -> pa.Table:
        """One term bucket -> tagged partial rows:
        (a, b, v, part): b >= 0 pair dot partial, b == -1 norm partial
        keyed by doc a.  A sentinel (-1, -2) row keeps the schema alive
        for fully-pruned buckets."""
        import pandas as pd

        term = g.column("term").to_numpy(zero_copy_only=False)
        doc = g.column("doc_id").to_numpy(zero_copy_only=False)
        tf = g.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        codes, _ = pd.factorize(term)
        order = np.argsort(codes, kind="stable")
        c2, d2, f2 = codes[order], doc[order], tf[order]
        bounds = np.flatnonzero(np.concatenate([[True], c2[1:] != c2[:-1]]))
        counts = np.diff(np.append(bounds, len(c2)))
        df = np.repeat(counts, counts)  # per-posting df of its term
        w = f2 * np.log(float(n_docs) / df)
        # norm partials: per-doc sum of w^2 over this bucket's terms
        dsort = np.argsort(d2, kind="stable")
        dd, ww2 = d2[dsort], (w * w)[dsort]
        nb = np.flatnonzero(np.concatenate([[True], dd[1:] != dd[:-1]]))
        norm_doc = dd[nb]
        norm_v = np.add.reduceat(ww2, nb)
        # pair dot partials, df-capped
        o_a = [norm_doc, np.array([-1], np.int64)]
        o_b = [np.full(len(norm_doc), -1, np.int64),
               np.array([-2], np.int64)]
        o_v = [norm_v, np.array([0.0])]
        for s, c in zip(bounds.tolist(), counts.tolist()):
            if c < 2 or c > max_df:
                continue
            seg_d, seg_w = d2[s:s + c], w[s:s + c]
            so = np.argsort(seg_d)
            seg_d, seg_w = seg_d[so], seg_w[so]
            iu, ju = np.triu_indices(c, k=1)
            o_a.append(seg_d[iu])
            o_b.append(seg_d[ju])
            o_v.append(seg_w[iu] * seg_w[ju])
        a = np.concatenate(o_a)
        b = np.concatenate(o_b)
        v = np.concatenate(o_v)
        part = hash_part(a * np.int64(1_000_003) + b, n_parts)
        return pa.table({"a": pa.array(a, pa.int64()),
                         "b": pa.array(b, pa.int64()),
                         "v": pa.array(v, pa.float64()),
                         "part": pa.array(part, pa.int32())})

    bucket_pass.__name__ = "tfidf_bucket"

    def sum_part(g: pa.Table) -> pa.Table:
        """Sum v per (a, b) key — works for both row kinds (norm rows
        key on (doc, -1)); drops the (-1, -2) sentinels."""
        a = g.column("a").to_numpy(zero_copy_only=False)
        b = g.column("b").to_numpy(zero_copy_only=False)
        v = g.column("v").to_numpy(zero_copy_only=False)
        real = b != -2
        a, b, v = a[real], b[real], v[real]
        order = np.lexsort((b, a))
        a2, b2, v2 = a[order], b[order], v[order]
        bounds = np.flatnonzero(np.concatenate(
            [[True], (a2[1:] != a2[:-1]) | (b2[1:] != b2[:-1])]))
        if len(a2) == 0:
            bounds = np.array([], np.int64)
            sums = np.array([], np.float64)
        else:
            sums = np.add.reduceat(v2, bounds)
        return pa.table({"a": pa.array(a2[bounds], pa.int64()),
                         "b": pa.array(b2[bounds], pa.int64()),
                         "v": pa.array(sums, pa.float64())})

    sum_part.__name__ = "tfidf_sum"
    post = docs.map_batches(postings, batch_format="pyarrow")
    tagged = post.groupby("term_bucket", num_partitions=n_parts).map_groups(
        bucket_pass, batch_format="pyarrow")
    summed = tagged.groupby("part", num_partitions=n_parts).map_groups(
        sum_part, batch_format="pyarrow").materialize()  # dots + norms

    dots = summed.map_batches(
        lambda t: pa.table({
            "doc_a": t.filter(pc.greater_equal(t.column("b"), 0)).column("a"),
            "doc_b": t.filter(pc.greater_equal(t.column("b"), 0)).column("b"),
            "dot": t.filter(pc.greater_equal(t.column("b"), 0)).column("v"),
        }), batch_format="pyarrow")
    norms = summed.map_batches(
        lambda t: pa.table({
            "nd": t.filter(pc.equal(t.column("b"), -1)).column("a"),
            "n2": t.filter(pc.equal(t.column("b"), -1)).column("v"),
        }), batch_format="pyarrow")
    norms_b = norms.map_batches(
        lambda t: pa.table({"nd_b": t.column("nd"), "n2_b": t.column("n2")}),
        batch_format="pyarrow")

    j1 = hash_join(dots, norms, "doc_a", "nd", how="inner")
    j2 = hash_join(j1, norms_b, "doc_b", "nd_b", how="inner")
    out = j2.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater(t.column("dot"), 0),
            pc.greater_equal(
                pc.multiply(t.column("dot"), t.column("dot")),
                pc.multiply(pa.scalar(t2),
                            pc.multiply(t.column("n2"), t.column("n2_b")))),
        )).select(["doc_a", "doc_b"]),
        batch_format="pyarrow")
    # On a fully-pruned corpus (every term's df > max_df) the join chain
    # emits only schema-less empty bundles and the result would surface
    # as a no-column frame; one 0-row schema-carrying block keeps the
    # (doc_a, doc_b) contract discoverable when the answer is empty.
    import ray.data

    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    return out.union(ray.data.from_arrow(empty))


def repetition_stats(batch: pa.Table) -> pa.Table:
    """Within-document repetition signals (the MassiveText/Gopher quality
    filters: Rae et al. 2021, table A1): per doc, how much of it is
    duplicated lines and duplicated word 3-grams.  High values mark
    boilerplate/spam that dedup-across-docs cannot catch.

    Fully vectorized across the batch: ONE Arrow split per signal
    (split_pattern / utf8_split_whitespace), one dictionary_encode to map
    every line/word in the batch to an int code, then segmented numpy
    uniques keyed by (row_index, code) — no per-document Python loop.

    Integer outputs (oracle-hash friendly):
      n_lines, n_dup_lines   — occurrences beyond each line's first
      chars_dup_lines        — characters in those repeated occurrences
      n_grams3, n_dup_grams3 — same for word 3-grams
    """
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    n = batch.num_rows
    I = np.uint64  # noqa: E741

    # --- duplicate lines (empty lines excluded: blank runs are layout,
    #     not content, and would dominate the dup counts)
    lines = pc.split_pattern(text, "\n")
    flat_l = pc.list_flatten(lines)
    lens_l = pc.list_value_length(lines).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    nonempty = pc.greater(pc.utf8_length(flat_l), 0)
    ne_np = nonempty.to_numpy(zero_copy_only=False)
    row_l = np.repeat(np.arange(n, dtype=np.int64), lens_l)[ne_np]
    flat_ne = flat_l.filter(nonempty)
    lens_ne = np.bincount(row_l, minlength=n).astype(np.int64)
    chars = pc.utf8_length(flat_ne).to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    # rebuild per-row segmentation over the filtered items
    n_lines, n_dup_lines, chars_dup = _seg_dups_rows(
        flat_ne, row_l, lens_ne, chars, n)

    # --- duplicate word 3-grams
    words = pc.utf8_split_whitespace(text)
    flat_w = pc.list_flatten(words)
    lens_w = pc.list_value_length(words).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if int(lens_w.sum()):
        # utf8_split_whitespace (unlike Python str.split) emits empty
        # tokens at leading/trailing whitespace — drop them so gram
        # counts match the conventional word sequence
        ne_w = pc.greater(pc.utf8_length(flat_w), 0)
        ne_w_np = ne_w.to_numpy(zero_copy_only=False)
        flat_w = flat_w.filter(ne_w)
        if isinstance(flat_w, pa.ChunkedArray):
            flat_w = flat_w.combine_chunks()
        wcodes = pc.dictionary_encode(flat_w).indices \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
        roww = np.repeat(np.arange(n, dtype=np.int64), lens_w)[ne_w_np]
        # 3-gram = splitmix-mixed triple of word codes at i, i+1, i+2
        # (valid where all three land in the same row)
        valid = np.zeros(len(wcodes), bool)
        if len(wcodes) >= 3:
            valid[:-2] = roww[:-2] == roww[2:]
        gi = np.flatnonzero(valid)
        from .dedup import _mix64
        g = _mix64(_mix64(wcodes[gi] * I(0x9E3779B97F4A7C15)
                          ^ wcodes[gi + 1]) * I(0xC2B2AE3D27D4EB4F)
                   ^ wcodes[gi + 2])
        rowg = roww[gi]
        n_g, n_dup_g, _ = _seg_dups_rows(None, rowg,
                                         np.bincount(rowg, minlength=n)
                                         .astype(np.int64), None, n,
                                         codes=g)
    else:
        n_g = np.zeros(n, np.int64)
        n_dup_g = np.zeros(n, np.int64)

    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_lines": pa.array(n_lines, pa.int64()),
        "n_dup_lines": pa.array(n_dup_lines, pa.int64()),
        "chars_dup_lines": pa.array(chars_dup, pa.int64()),
        "n_grams3": pa.array(n_g, pa.int64()),
        "n_dup_grams3": pa.array(n_dup_g, pa.int64()),
    })


def _seg_dups_rows(flat, row: np.ndarray, lens: np.ndarray,
                   weights: "np.ndarray | None", n: int,
                   codes: "np.ndarray | None" = None):
    """Per-row duplicate-item counts over a flattened item array.

    Items are row-local: an item is a duplicate if an equal one occurred
    earlier in the same row.  `flat` is an Arrow string array (dictionary
    -encoded here) or None when integer `codes` are passed directly.
    Returns (n_items, n_dup_items, weighted_dup) int64 arrays of len n."""
    I = np.uint64  # noqa: E741
    total = len(row)
    if total == 0:
        z = np.zeros(n, np.int64)
        return lens, z, z.copy()
    if codes is None:
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        codes = pc.dictionary_encode(flat).indices \
            .to_numpy(zero_copy_only=False).astype(np.uint64)
    else:
        codes = codes.astype(np.uint64)
    key = row.astype(np.uint64) * (codes.max() + I(1)) + codes
    _, first = np.unique(key, return_index=True)
    dup_mask = np.ones(total, bool)
    dup_mask[first] = False
    n_dup = np.bincount(row[dup_mask], minlength=n).astype(np.int64)
    if weights is not None:
        w_dup = np.bincount(row[dup_mask], weights=weights[dup_mask],
                            minlength=n).astype(np.int64)
    else:
        w_dup = n_dup
    return lens, n_dup, w_dup


# PII patterns, RE2-compatible (no lookarounds) so the Arrow kernel and
# the DuckDB regexp_* functions (both RE2) agree byte-for-byte.  Word
# boundaries are \b (supported by RE2).
PII_PATTERNS = (
    # order matters: emails before phones (digits in local parts),
    # ipv4 before phones (dotted runs)
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+?[0-9]{1,3}[-. ][0-9]{3}[-. ][0-9]{3,4}[-. ]?[0-9]{0,4}"
              r"|\([0-9]{3}\) ?[0-9]{3}-[0-9]{4}"),
    ("hexsecret", r"\b[0-9a-f]{32,}\b"),
)


def redact_pii(batch: pa.Table) -> pa.Table:
    """Redact common PII (emails, IPv4s, phone-ish numbers, long hex
    secrets) with typed placeholders, plus integer per-category match
    counts — the standard scrub pass before a corpus leaves curation.

    Stateless vectorized map_batches: counting and replacement both run
    in Arrow's RE2 (count_substring_regex / replace_substring_regex) —
    no Python-level regex loop, and the patterns are RE2-written so a
    DuckDB oracle (also RE2) reproduces the output byte-for-byte.
    Replacements apply in PII_PATTERNS order; counts are measured on the
    text each pattern actually sees (after earlier replacements)."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    cols: dict = {"doc_id": batch.column("doc_id")}
    counts: dict = {}
    for name, pat in PII_PATTERNS:
        counts[f"n_{name}"] = pc.count_substring_regex(
            text, pat).cast(pa.int64())
        text = pc.replace_substring_regex(
            text, pat, f"<{name.upper()}>")
    cols["text"] = text
    cols.update(counts)
    return pa.table(cols)


def derive_needle_grams(docs: "ray.data.Dataset", n: int = 8,
                        modulus: int = 37) -> "list[str]":
    """Deterministic benchmark-needle derivation: the first n-token gram
    of every doc with doc_id % modulus == 0 (stand-in for a benchmark
    passage list; distinct strings).  Distributed extract, tiny driver
    result — the needle SET is small by construction, like a real
    eval-set n-gram list."""

    def extract(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sub = b.filter(pa.array(ids % modulus == 0))
        toks = pc.split_pattern(pc.fill_null(sub.column("text"), ""), " ")
        out = []
        for lst in toks.to_pylist():  # needle docs only: tiny by filter
            if len(lst) >= n:
                out.append(" ".join(lst[:n]))
        return pa.table({"needle": pa.array(out, pa.string())})

    rows = docs.map_batches(extract, batch_format="pyarrow").take_all()
    return sorted({r["needle"] for r in rows})


def decontaminate_bloom(docs: "ray.data.Dataset", needles: "list[str]",
                        n: int = 8,
                        m_bits: int = 1 << 20) -> "ray.data.Dataset":
    """Benchmark decontamination at corpus scale: word n-gram Bloom
    prefilter + exact verification of the survivors (GPT-3 appendix-C
    style n-gram overlap scan).

    Why Bloom: the naive scan is O(corpus x needles) substring searches —
    fine for 10 needles (q_doc_contamination), impossible for the ~1e5+
    n-grams a real eval-suite decontamination carries.  Here each doc is
    scanned ONCE regardless of needle count: all its word n-gram hashes
    (shared vectorized FNV/splitmix kernel — dedup.word_hashes_flat) are
    tested against a broadcast m_bits/8-byte bit array.  Only docs with
    at least one Bloom hit (true matches + the ~(1-e^{-kn/m})^k false
    positives) reach the exact per-needle verify, so the expensive pass
    is proportional to the contamination rate, not the corpus.

    Exactness: no false negatives — on space-normalized text (see
    doc_normalize for the messy-input path) a word-aligned needle
    occurrence IS one of the doc's token n-grams, hashed by the same
    kernel that built the filter.  Output (doc_id, n_hits) is therefore
    byte-equal to the exact scan / the DuckDB oracle.

    Scale: the filter is built once from the needle list (driver-side,
    needle lists are small), `ray.put` once, read zero-copy per task."""
    import ray as _ray

    from .dedup import flat_utf8, ngram_hashes_flat, word_hashes_flat
    from .sketches import BloomFilter

    ndata, noff, _ = flat_utf8(pa.array(needles, pa.string()))
    wh, wd = word_hashes_flat(ndata, noff)
    gh, _ = ngram_hashes_flat(wh, wd, n)
    bloom = BloomFilter(m_bits)
    bloom.add_many(gh)
    bits_ref = _ray.put(bloom.bits)
    padded = [f" {nd} " for nd in needles]

    def scan(b: pa.Table) -> pa.Table:
        bf = BloomFilter(m_bits, bits=_ray.get(bits_ref))
        data, off, ndocs = flat_utf8(b.column("text"))
        w_h, w_d = word_hashes_flat(data, off)
        g_h, g_d = ngram_hashes_flat(w_h, w_d, n)
        hit_docs = np.unique(g_d[bf.contains_many(g_h)])
        if not len(hit_docs):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        sub = b.take(pa.array(hit_docs, pa.int64()))
        text = pc.binary_join_element_wise(
            " ", pc.fill_null(sub.column("text"), ""), " ", "")
        hits = np.zeros(len(hit_docs), np.int64)
        for nd in padded:  # survivors only — exact, collision-free
            hits += pc.match_substring(text, nd).cast(
                pa.int64()).to_numpy(zero_copy_only=False)
        keep = hits > 0
        ids = sub.column("doc_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_hits": pa.array(hits[keep], pa.int64()),
        })

    return docs.map_batches(scan, batch_format="pyarrow")


def compression_stats(batch: pa.Table, level: int = 6) -> pa.Table:
    """Per-doc zlib compression ratio — the classic redundancy / quality
    signal (highly repetitive or templated text compresses far below
    natural prose; cf. Gopher's repetition filters, which repetition_stats
    implements combinatorially).  The loop is per-document but each
    iteration is one C zlib call on the whole doc — no per-byte Python.
    ratio_e4 = compressed/original in 1e-4 units (int64, deterministic:
    zlib output is fixed for a given input+level)."""
    text = batch.column("text")
    if text.null_count:
        text = text.fill_null("")
    ratios = np.empty(batch.num_rows, np.int64)
    for i, t in enumerate(text.to_pylist()):
        raw = t.encode("utf-8")
        ratios[i] = (len(zlib.compress(raw, level)) * 10_000
                     // max(len(raw), 1))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_bytes": pc.binary_length(text.cast(pa.binary())).cast(pa.int64()),
        "zlib_ratio_e4": pa.array(ratios, pa.int64()),
    })
