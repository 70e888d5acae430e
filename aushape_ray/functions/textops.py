"""Text-analysis operators for the documents table (training-data ops).

All stateless vectorized `map_batches` transforms over Arrow batches, or
actor-pool classes where a compiled/loaded state is amortized
(`LangId`).  Counting queries use integer outputs so DuckDB oracle
value-hashes match exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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
    """doc_id, n_chars, n_tokens (whitespace), n_bpe_tokens (BPE-ish)."""
    import re

    bpe = re.compile(BPE_REGEX)
    texts = batch.column("text").to_pylist()
    n_tokens = [len(re.findall(r"\S+", t or "")) for t in texts]
    n_bpe = [len(bpe.findall(t or "")) for t in texts]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
        "n_bpe_tokens": pa.array(n_bpe, pa.int64()),
    })


def char_stats(batch: pa.Table) -> pa.Table:
    """doc_id + integer char-class counts (quality-scoring inputs)."""
    import re

    upper = re.compile(r"[A-Z]")
    digit = re.compile(r"[0-9]")
    punct = re.compile(_PUNCT_CLASS)
    texts = batch.column("text").to_pylist()
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_upper": pa.array([len(upper.findall(t or "")) for t in texts], pa.int64()),
        "n_digit": pa.array([len(digit.findall(t or "")) for t in texts], pa.int64()),
        "n_punct": pa.array([len(punct.findall(t or "")) for t in texts], pa.int64()),
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
