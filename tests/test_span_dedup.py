"""span_dedup: exact aligned-span dedup with reassembly.

DuckDB (unnest + row_number + ordered string_agg) is the value-exact
reference; the constructed corpus plants duplicates that cross batch and
bucket boundaries, a doc whose every span is removed, an empty doc, and
consecutive spaces (empty words must survive split/join byte-exactly).
"""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import ray

from aushape_ray.functions.dedup import span_dedup

W = 4  # small spans so the corpus stays readable


def _oracle(tbl: pa.Table, w: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("documents", tbl)
    return con.sql(f"""
WITH wt AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), seg AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(ws[(i*{w}+1):(i*{w}+{w})], ' ') AS seg
  FROM wt, LATERAL (SELECT unnest(generate_series(0,
       CAST(ceil(len(ws)/{w}.0) AS INT) - 1)) AS i)
), ranked AS (
  SELECT doc_id, seg_idx, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
  FROM seg
)
SELECT doc_id,
       count(*) AS n_spans,
       count(*) FILTER (WHERE rn > 1) AS n_removed,
       md5(coalesce(string_agg(seg, ' ' ORDER BY seg_idx)
                    FILTER (WHERE rn = 1), '')) AS clean_md5
FROM ranked GROUP BY doc_id ORDER BY doc_id""").df()


def _corpus() -> pa.Table:
    dup = " ".join(f"w{i}" for i in range(W))
    other = " ".join(f"z{i}" for i in range(W))
    docs = [
        (10, dup + " " + " ".join(f"a{i}" for i in range(6))),
        (11, dup + " " + dup),       # both spans duplicated -> empty doc
        (12, " ".join(f"b{i}" for i in range(2 * W + 1))),  # 1-word tail
        (13, ""),                    # empty doc: one empty span
        (14, dup),                   # single duplicated span
        (15, "x  y " + dup),         # consecutive spaces: empty word
        (16, other + " mid " + other),  # unaligned repeat: NOT a dup
        (17, other),                 # dup of doc 16's first span
        (18, "unicode éé " + dup + " tail"),
    ]
    return pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.large_string()),
    })


def test_span_dedup_matches_duckdb(ray_session):
    tbl = _corpus()
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = (span_dedup(ds, span_words=W, n_buckets=4).to_pandas()
           .sort_values("doc_id", ignore_index=True))
    exp = _oracle(tbl, W)
    for c in ("n_spans", "n_removed"):
        got[c] = got[c].astype("int64")
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
    # the corpus exercises real removal, full-doc removal, and keeps
    assert got.set_index("doc_id").loc[11, "n_removed"] == 2
    assert got.set_index("doc_id").loc[14, "n_removed"] == 1
    assert got.set_index("doc_id").loc[16, "n_removed"] == 0


def test_span_dedup_noop_reassembly_is_byte_exact(ray_session):
    """With no duplicates at all, clean_md5 must equal md5(text): the
    explode/rejoin round-trip is byte-exact (split sep == join sep)."""
    import hashlib

    texts = ["single", "", "a  b", " lead", "trail ",
             " ".join(f"u{i}" for i in range(W * 3 + 2))]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.large_string()),
    })
    got = (span_dedup(ray.data.from_arrow(tbl), span_words=W, n_buckets=2)
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert (got["n_removed"] == 0).all()
    exp = [hashlib.md5(t.encode()).hexdigest() for t in texts]
    assert list(got["clean_md5"]) == exp
