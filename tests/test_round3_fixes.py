"""Round-3 regression tests: all_pairs_cosine brute-force parity across
multiple occupied blocks, and cluster_pairs' static pre-bucketed edge
exchange over multi-block inputs."""

import numpy as np
import pyarrow as pa
import pytest


def _clustered_vectors(n: int, dim: int, seed: int = 5):
    """Vectors in a few tight clusters so threshold pairs actually exist,
    plus noise vectors so most pairs do NOT match."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(5, dim))
    which = rng.integers(0, 5, n)
    vecs = centers[which] + rng.normal(scale=0.05, size=(n, dim))
    noise = rng.normal(size=(n // 3, dim))
    return np.vstack([vecs, noise])


def test_all_pairs_cosine_matches_bruteforce_multiblock(ray_session):
    """Exact block-pair exchange == brute-force all-pairs similarity set,
    with every block occupied and the input split across several Ray
    blocks (the round-2 rewrite shipped with only a dedup test)."""
    import ray.data

    from aushape_ray.functions.ann import all_pairs_cosine

    vecs = _clustered_vectors(150, 8)
    n = len(vecs)
    ids = np.arange(1000, 1000 + n, dtype=np.int64)
    threshold = 0.95

    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    r, c = np.nonzero(sims >= threshold)
    want = {(int(ids[i]), int(ids[j])) for i, j in zip(r, c) if ids[i] < ids[j]}
    assert len(want) > 50  # the test must exercise real matches

    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64(), 8)),
    })
    for n_blocks in (2, 4):
        ds = ray.data.from_arrow(t).repartition(6)
        out = all_pairs_cosine(ds, threshold, n_blocks=n_blocks).take_all()
        got = [(r_["vec_a"], r_["vec_b"]) for r_ in out]
        assert len(got) == len(set(got)), "duplicate pairs"
        assert set(got) == want, n_blocks


def test_cluster_pairs_multiblock_edges(ray_session):
    """The static edge bucketing must survive edge sets spread over many
    input blocks (split + per-bucket concat path)."""
    import random

    import ray.data

    from aushape_ray.functions.dedup import cluster_pairs

    rng = random.Random(99)
    n_nodes, n_edges = 500, 2000
    ea = [rng.randrange(n_nodes) for _ in range(n_edges)]
    eb = [rng.randrange(n_nodes) for _ in range(n_edges)]
    pairs = pa.table({"doc_a": pa.array(ea, pa.int64()),
                      "doc_b": pa.array(eb, pa.int64())})

    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ea, eb):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for a, b in zip(ea, eb):
        for x in (a, b):
            truth[x] = find(x)

    ds = ray.data.from_arrow(pairs).repartition(8)
    out = cluster_pairs(ds, small_threshold=0, n_buckets=8).take_all()
    got = {r["doc_id"]: r["cluster_id"] for r in out}
    assert got == truth


def test_simhash_unicode_and_doc_boundaries():
    """Byte-level tokenizer edge cases: words crossing batch-internal doc
    boundaries must not merge; unicode bytes are word bytes; leading and
    trailing whitespace docs behave like their stripped forms."""
    from aushape_ray.functions.dedup import SimHasher

    sh = SimHasher()
    # adjacent docs ending/starting with non-ws bytes: "a b cd" | "e f g"
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b cd", "e f g", None, "  padded words here  "],
                         pa.string()),
    })
    got = sh(t).column("simhash").to_pylist()
    assert got[0] == sh.simhash("a b cd")
    assert got[1] == sh.simhash("e f g")
    assert got[2] == 0
    assert got[3] == sh.simhash("padded words here")


def test_shared_term_pairs_matches_bruteforce(ray_session):
    """Inverted-index pair join == brute-force shared-distinct-term
    counts, including DF pruning at both ends (df=1 dropped, df>max_df
    dropped)."""
    import itertools

    import ray.data

    from aushape_ray.functions.textops import shared_term_pairs

    import random
    rng = random.Random(11)
    vocab = [f"{a}{b}x" for a in "abcdefgh" for b in "abcde"]  # 40 words,
    # letters only ([a-z]+ must not split a vocab word)
    docs = []
    for d in range(60):
        terms = rng.sample(vocab, rng.randint(5, 25))
        # "common" appears in every doc -> df 62 > max_df, always pruned
        docs.append(" ".join(terms + [terms[0], "common"]))
    docs.append("")                 # empty doc
    docs.append("stop common " * 5)  # doc whose only kept term is df=1
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})

    max_df, min_shared = 30, 4
    term_docs = {}
    doc_terms = []
    import re
    for i, txt in enumerate(docs):
        ts = set(re.findall(r"[a-z]+", txt))
        doc_terms.append(ts)
        for w in ts:
            term_docs.setdefault(w, set()).add(i)
    kept = {w for w, ds_ in term_docs.items() if 2 <= len(ds_) <= max_df}
    want = {}
    for a, b in itertools.combinations(range(len(docs)), 2):
        n = len(doc_terms[a] & doc_terms[b] & kept)
        if n >= min_shared:
            want[(a, b)] = n

    out = shared_term_pairs(ray.data.from_arrow(t).repartition(4),
                            min_shared=min_shared, max_df=max_df,
                            n_parts=8).take_all()
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"] for r in out}
    assert got == want
    assert len(want) > 10  # the test must exercise real pairs


def test_exact_quantiles_matches_numpy_rank(ray_session):
    """Distributed rank selection == sorted(x)[floor(q*(n-1))], with
    duplicates and multiple blocks."""
    import math

    import ray.data

    from aushape_ray.functions.sketches import exact_quantiles

    rng = np.random.default_rng(3)
    vals = np.round(rng.normal(size=997), 2)  # duplicates via rounding
    t = pa.table({"value": pa.array(vals, pa.float64())})
    qs = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    got = exact_quantiles(ray.data.from_arrow(t).repartition(7),
                          "value", qs=qs)
    sv = np.sort(vals)
    for q, v in got:
        assert v == sv[min(len(sv) - 1, math.floor(q * (len(sv) - 1)))], q


def test_bucket_reduce_tree_exchange(ray_session):
    """Raw-Ray bucket_reduce == per-bucket reduce over the full dataset,
    across multiple input blocks."""
    import ray.data

    from aushape_ray.functions.joins import bucket_reduce

    rng = np.random.default_rng(8)
    k = rng.integers(0, 1000, 5000, dtype=np.int64)
    v = rng.integers(1, 10, 5000, dtype=np.int64)
    t = pa.table({"b": pa.array((k % 4).astype(np.int32), pa.int32()),
                  "k": pa.array(k, pa.int64()),
                  "v": pa.array(v, pa.int64())})

    def per_key_sum(g: pa.Table) -> pa.Table:
        import pandas as pd

        s = pd.Series(g.column("v").to_numpy(zero_copy_only=False),
                      index=g.column("k").to_numpy(zero_copy_only=False)
                      ).groupby(level=0).sum()
        return pa.table({"k": pa.array(s.index.to_numpy(), pa.int64()),
                         "v": pa.array(s.to_numpy(), pa.int64())})

    out = bucket_reduce(ray.data.from_arrow(t).repartition(6), 4,
                        per_key_sum)
    got = {}
    for tbl in out:
        for kk, vv in zip(tbl.column("k").to_pylist(),
                          tbl.column("v").to_pylist()):
            assert kk not in got  # each key in exactly one bucket
            got[kk] = vv
    import collections
    want = collections.defaultdict(int)
    for kk, vv in zip(k.tolist(), v.tolist()):
        want[kk] += vv
    assert got == dict(want)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 7), st.integers(-1000, 1000)),
                min_size=0, max_size=300),
       st.integers(2, 8))
def test_bucket_exchange_equals_groupby(ray_session, rows, n_buckets):
    """bucket_exchange(fn) must equal groupby(bucket).map_groups(fn) for
    a per-bucket aggregate, for arbitrary bucket occupancy (including
    empty buckets and an empty dataset)."""
    import ray.data

    from aushape_ray.functions.joins import bucket_exchange

    b = np.array([r[0] % n_buckets for r in rows], np.int32)
    v = np.array([r[1] for r in rows], np.int64)
    t = pa.table({"__bucket": pa.array(b, pa.int32()),
                  "v": pa.array(v, pa.int64())})

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"__bucket": pa.array([], pa.int32()),
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        vv = g.column("v").to_numpy(zero_copy_only=False)
        bb = g.column("__bucket")[0].as_py()
        return pa.table({"__bucket": pa.array([bb], pa.int32()),
                         "s": pa.array([int(vv.sum())], pa.int64()),
                         "n": pa.array([len(vv)], pa.int64())})

    per_bucket.__name__ = "per_bucket"
    ds = ray.data.from_arrow(t).repartition(3)
    got = {r["__bucket"]: (r["s"], r["n"])
           for r in bucket_exchange(ds, n_buckets, per_bucket).take_all()}
    want = {}
    for bb, vv in zip(b.tolist(), v.tolist()):
        s, n = want.get(bb, (0, 0))
        want[bb] = (s + vv, n + 1)
    assert got == want


def test_verify_pairs_jaccard_bucketed(ray_session):
    """verify_pairs_jaccard (bucket-colocated text fetch): scores match the
    scalar jaccard() reference on every surviving pair; pairs referencing a
    doc_id absent from docs are dropped (inner-join semantics); a hot doc
    appearing in many pairs across many partner buckets is scored
    consistently everywhere it appears."""
    import random

    import ray.data

    from aushape_ray.functions.dedup import jaccard, verify_pairs_jaccard

    rng = random.Random(1234)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lambda", "mu"]
    docs = {}
    for i in range(40):
        docs[i] = " ".join(rng.choice(words) for _ in range(rng.randint(6, 30)))
    docs[7] = docs[3]            # exact dup pair
    docs[11] = docs[3] + " omega"  # near dup
    docs[12] = ""                # empty text still scoreable

    pairs = []
    hot = 3  # hot doc: pairs against most of the corpus -> many partner buckets
    for j in range(40):
        if j != hot:
            pairs.append((hot, j))
    for _ in range(60):
        a, b = rng.sample(range(40), 2)
        pairs.append((a, b))
    pairs.append((5, 999))    # right doc missing -> dropped
    pairs.append((998, 5))    # left doc missing -> dropped
    pairs.append((998, 999))  # both missing -> dropped

    docs_t = pa.table({
        "doc_id": pa.array(sorted(docs), pa.int64()),
        "text": pa.array([docs[i] for i in sorted(docs)], pa.string()),
    })
    pairs_t = pa.table({
        "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
        "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
    })
    # include an all-empty block (filters upstream produce them): the
    # need-list kernel must not choke on a 0-row batch
    empty_pairs = pairs_t.slice(0, 0)
    pairs_ds = ray.data.from_arrow(pairs_t).repartition(5).union(
        ray.data.from_arrow(empty_pairs))
    out = verify_pairs_jaccard(
        pairs_ds,
        ray.data.from_arrow(docs_t).repartition(4),
        n_buckets=8,
    ).take_all()

    want = {(a, b) for a, b in pairs if a in docs and b in docs}
    got = {(r["doc_a"], r["doc_b"]) for r in out}
    assert got == want  # missing-doc pairs dropped, nothing else lost
    assert len(out) == len([p for p in pairs if p[0] in docs and p[1] in docs])
    for r in out:
        expect = jaccard(docs[r["doc_a"]], docs[r["doc_b"]])
        assert abs(r["jaccard"] - expect) < 1e-12, (r, expect)


def test_emb_dedup_near_matches_duckdb(ray_session):
    """emb_dedup_near (all-pairs cosine -> connected components ->
    keep-min survivors) matches the DuckDB recursive-CTE transitive
    closure exactly.  Rows-only in the driver registry (the 50-slot
    oracle window is full), so parity is enforced here instead."""
    import duckdb

    from aushape_ray.pipelines.queries import (q_emb_dedup_near,
                                               sql_emb_dedup_near)

    sf = "/root/testdata/sf0.001"
    got = sorted(r["vec_id"] for r in q_emb_dedup_near(sf).take_all())

    con = duckdb.connect()
    con.sql("create view embeddings as select * from "
            f"read_parquet('{sf}/embeddings.parquet')")
    want = sorted(r[0] for r in con.sql(sql_emb_dedup_near()).fetchall())
    assert len(want) < 500  # threshold formed real clusters (66 pairs)
    assert got == want


def test_jaccard_pairs_exact_matches_duckdb(ray_session):
    """jaccard_pairs_exact (standalone exact n-gram Jaccard discovery, no
    LSH) matches DuckDB's exploded set-similarity join on pair set AND
    jaccard values; a df-capped run returns a subset (conservative lower
    bounds can only drop pairs, never invent them)."""
    import duckdb

    import ray.data

    from aushape_ray.functions.dedup import jaccard_pairs_exact

    sf = "/root/testdata/sf0.001"
    docs = ray.data.read_parquet(f"{sf}/documents.parquet",
                                 columns=["doc_id", "text"],
                                 override_num_blocks=8)
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in jaccard_pairs_exact(docs, threshold=0.5).take_all()}

    con = duckdb.connect()
    con.sql("create view documents as select * from "
            f"read_parquet('{sf}/documents.parquet')")
    want = {(a, b): j for a, b, j in con.sql("""
WITH g AS (
  SELECT doc_id, UNNEST(list_distinct(list_transform(
           range(1, greatest(length(text)-3, 2)),
           i -> substring(text, i::INT, 5)))) AS gram
  FROM documents),
sz AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
  FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, c::DOUBLE / (sa.n + sb.n - c) AS j
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE c::DOUBLE / (sa.n + sb.n - c) >= 0.5""").fetchall()}

    assert set(got) == set(want)
    assert len(want) > 0  # the corpus has true near-dup pairs
    for k, j in got.items():
        assert abs(j - want[k]) < 1e-12, (k, j, want[k])

    capped = {(r["doc_a"], r["doc_b"]) for r in
              jaccard_pairs_exact(docs, threshold=0.5,
                                  max_df=8).take_all()}
    assert capped <= set(got)


def test_jaccard_pairs_prefix_matches_exact(ray_session):
    """jaccard_pairs_prefix (AllPairs/PPJoin prefix filtering) returns
    EXACTLY the uncapped jaccard_pairs_exact result — pair set and
    values — on a corpus with planted near-dups.  The per-doc prefix
    |A| - ceil(t|A|) + 1 in the global (df, gram) rarest-first order is
    a guaranteed-superset candidate bound, so no pair can be lost."""
    import random

    import ray.data

    from aushape_ray.functions.dedup import (jaccard_pairs_exact,
                                             jaccard_pairs_prefix)

    rng = random.Random(41)
    alpha = "abcdefghij "
    texts = ["".join(rng.choice(alpha) for _ in range(120))
             for _ in range(30)]
    # plant near-dups: light point mutations of existing docs
    for i in range(10):
        src = list(texts[i])
        for _ in range(4):
            src[rng.randrange(len(src))] = rng.choice(alpha)
        texts.append("".join(src))
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    docs = ray.data.from_items(rows).map_batches(
        lambda t: t, batch_format="pyarrow")

    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in jaccard_pairs_exact(
                 docs, threshold=0.5, n_parts=8).take_all()}
    pref = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs_prefix(
                docs, threshold=0.5, n_parts=8).take_all()}

    assert len(exact) >= 10  # the planted mutations survive t=0.5
    assert set(pref) == set(exact)
    for k, j in pref.items():
        assert abs(j - exact[k]) < 1e-12, (k, j, exact[k])


def test_repetition_stats_scalar_parity(ray_session):
    """repetition_stats (vectorized Arrow split + dictionary_encode +
    segmented uniques) matches a per-doc scalar reference on random
    multi-line texts with planted repeated lines and 3-grams, across
    multiple Ray batches."""
    import random

    import pyarrow as pa
    import ray.data

    from aushape_ray.functions.textops import repetition_stats

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = []
    for _ in range(200):
        lines = []
        for _ in range(rng.randrange(0, 8)):
            lines.append(" ".join(rng.choice(vocab)
                                  for _ in range(rng.randrange(0, 6))))
        if lines and rng.random() < 0.5:
            lines.append(rng.choice(lines))  # planted duplicate line
        texts.append("\n".join(lines))
    texts += ["", None, "x\n\nx", "w w w w w"]

    def ref(t):
        t = t or ""
        lines = [ln for ln in t.split("\n") if ln]
        seen, nd, cd = set(), 0, 0
        for ln in lines:
            if ln in seen:
                nd += 1
                cd += len(ln)
            seen.add(ln)
        words = t.split()
        grams = [tuple(words[i:i + 3]) for i in range(len(words) - 2)]
        sg, ndg = set(), 0
        for g in grams:
            if g in sg:
                ndg += 1
            sg.add(g)
        return (len(lines), nd, cd, len(grams), ndg)

    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    out = (ray.data.from_items(rows)
           .map_batches(lambda b: pa.table(
               {"doc_id": b.column("doc_id"), "text": b.column("text")}),
               batch_format="pyarrow", batch_size=37)
           .map_batches(repetition_stats, batch_format="pyarrow",
                        batch_size=37)
           .take_all())
    assert len(out) == len(texts)
    for r in out:
        exp = ref(texts[r["doc_id"]])
        got = (r["n_lines"], r["n_dup_lines"], r["chars_dup_lines"],
               r["n_grams3"], r["n_dup_grams3"])
        assert got == exp, (r["doc_id"], got, exp)


def test_dup_span_stats_scalar_parity(ray_session):
    """dup_span_stats (distributed anchor postings + bucket exchanges)
    matches a single-process scalar reference that builds the same
    sampled-anchor multiset with a Counter: per-doc anchor counts, dup
    flags (global occurrence >= 2) and cross-doc flags (>= 2 distinct
    docs), on a corpus with a planted shared substring and self-repeats."""
    import random
    from collections import Counter

    import numpy as np
    import ray.data

    from aushape_ray.functions.dedup import dup_span_stats
    from aushape_ray.functions.textops import _poly_hashes

    WINDOW, MOD = 48, 4
    rng = random.Random(13)
    alpha = "abcdefghijklmnop "
    def rand_text(n):
        return "".join(rng.choice(alpha) for _ in range(n))

    shared = rand_text(300)
    texts = {i: rand_text(500) for i in range(25)}
    texts[2] = texts[2][:50] + shared + texts[2][50:]
    texts[9] = shared + texts[9]
    texts[14] = texts[14] + texts[14][:200]   # self-repeat only
    texts[20] = rand_text(10)                 # below window: no row

    def doc_anchors(t):
        data = np.frombuffer(t.encode("utf-8"), np.uint8)
        if len(data) < WINDOW:
            return np.array([], np.uint64)
        h = _poly_hashes(data, WINDOW)
        return h[h % np.uint64(MOD) == 0]

    per_doc = {i: doc_anchors(t) for i, t in texts.items()}
    global_count = Counter()
    doc_count = Counter()
    for i, hs in per_doc.items():
        global_count.update(hs.tolist())
        doc_count.update(set(hs.tolist()))
    expected = {}
    for i, hs in per_doc.items():
        if hs.size == 0:
            continue
        expected[i] = (
            hs.size,
            sum(global_count[h] >= 2 for h in hs.tolist()),
            sum(doc_count[h] >= 2 for h in hs.tolist()),
        )

    rows = [{"doc_id": i, "text": t} for i, t in texts.items()]
    got = {r["doc_id"]: (r["n_anchors"], r["n_dup_anchors"],
                         r["n_xdoc_anchors"])
           for r in dup_span_stats(ray.data.from_items(rows),
                                   window=WINDOW, sample_mod=MOD,
                                   n_parts=8).take_all()}
    assert got == expected
    assert expected[2][2] > 0 and expected[9][2] > 0      # cross-doc dup
    assert expected[14][1] > 0 and expected[14][2] == 0   # self-repeat
    assert 20 not in got


def test_redact_pii_duckdb_parity(ray_session):
    """redact_pii (Arrow RE2 count+replace) reproduces a DuckDB
    regexp_replace/regexp_extract_all chain byte-for-byte — both engines
    are RE2 and PII_PATTERNS is written lookaround-free — on a corpus of
    planted emails, IPs, phones, hex secrets, and adversarial non-PII."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from aushape_ray.functions.textops import PII_PATTERNS, redact_pii

    texts = [
        "mail john.doe+x@example.co.uk or root@10.0.0.1 now",
        "call +1-800-555-0199 or (212) 555-7890 x99",
        "key deadbeefdeadbeefdeadbeefdeadbeef end",
        "", None, "no pii here 42 v1.2.3.4beta",  # dotted but \\b-guarded
        "a@b.io a@b.io 255.255.255.255 999.999.999.999",
        "hex DEADBEEFDEADBEEFDEADBEEFDEADBEEF upper not matched",
        "ip 1.2.3.4. trailing dot and 1.2.3 too short",
    ] + [f"user{i}@host{i % 7}.org logged from 192.168.{i % 256}.{i % 100}"
         for i in range(120)]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})

    got = {r["doc_id"]: r for r in
           ray.data.from_arrow(batch)
           .map_batches(redact_pii, batch_format="pyarrow", batch_size=17)
           .take_all()}

    con = duckdb.connect()
    filled = batch.set_column(
        1, "text", pa.array([t or "" for t in texts], pa.string()))
    con.register("t", filled)
    expr, sel = "text", []
    for name, pat in PII_PATTERNS:
        sel.append(f"len(regexp_extract_all({expr}, '{pat}')) AS n_{name}")
        expr = f"regexp_replace({expr}, '{pat}', '<{name.upper()}>', 'g')"
    df = con.sql(
        f"SELECT doc_id, {expr} AS text, {', '.join(sel)} FROM t").df()

    assert len(got) == len(texts)
    for i in range(len(texts)):
        r = got[i]
        assert r["text"] == df.text[i], (i, r["text"], df.text[i])
        for name, _ in PII_PATTERNS:
            assert r[f"n_{name}"] == df[f"n_{name}"][i], (i, name)
    # the planted rows actually exercised every category
    assert got[0]["n_email"] and got[0]["n_ipv4"]
    assert got[1]["n_phone"] == 2 and got[2]["n_hexsecret"] == 1


def test_sampling_hash_parity_extreme_ids():
    """The masked Knuth-hash arithmetic used by q_doc_sample and
    q_events_sample_stratified matches DuckDB's HUGEINT form for ids
    beyond 2^32 and for negative ids — the exact ranges where the
    pre-fix code silently wrapped int64 while DuckDB raised or used
    sign-of-dividend modulo."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    K, M = 2654435761, 1 << 32
    ids = np.array([0, 1, 99, 2**31, 2**32 - 1, 2**32, 2**32 + 7,
                    2**62, 2**63 - 1, -1, -2**31, -2**62, -(2**63)],
                   np.int64)
    r = (ids % M).astype(np.uint64)
    h_py = ((r * np.uint64(K)) % np.uint64(M)).astype(np.int64)

    con = duckdb.connect()
    con.register("t", pa.table({"id": pa.array(ids, pa.int64())}))
    h_sql = con.sql(
        "SELECT (((id % 4294967296 + 4294967296) % 4294967296)::HUGEINT"
        "        * 2654435761) % 4294967296 AS h FROM t"
    ).df()["h"].to_numpy().astype(np.int64)
    assert (h_py == h_sql).all(), list(zip(ids, h_py, h_sql))


def test_tfidf_pairs_matches_bruteforce(ray_session):
    """tfidf_pairs == single-process numpy TF-IDF cosine all-pairs on a
    synthetic corpus spread over several Ray blocks (df cap inactive:
    every df <= max_df, so the result is the full exact pair set)."""
    import collections
    import re

    import ray.data

    from aushape_ray.functions.textops import tfidf_pairs

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(90):
        base = rng.choice(vocab, size=rng.integers(5, 25))
        texts.append(" ".join(base))
    # a few heavy near-dup pairs
    for i in range(0, 20, 2):
        texts[i + 1] = texts[i] + " extra"
    t = pa.table({"doc_id": pa.array(np.arange(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    word = re.compile(r"[a-z]+")
    tf = [collections.Counter(word.findall(x)) for x in texts]
    terms = sorted({w for c in tf for w in c})
    df = collections.Counter(w for c in tf for w in set(c))
    n = len(texts)
    idx = {w: j for j, w in enumerate(terms)}
    m = np.zeros((n, len(terms)))
    for i, c in enumerate(tf):
        for w, k in c.items():
            m[i, idx[w]] = k * np.log(n / df[w])
    norm = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = norm @ norm.T
    thr = 0.55
    r, c = np.nonzero(sims >= thr)
    want = {(int(i), int(j)) for i, j in zip(r, c) if i < j}
    assert len(want) >= 10

    ds = ray.data.from_arrow(t).repartition(6)
    got = {(row["doc_a"], row["doc_b"])
           for row in tfidf_pairs(ds, thr, max_df=1000, n_parts=8)
           .take_all()}
    assert got == want


class TestPpmCodec:
    """Real zero-dependency image codec: round trip, header tolerance,
    and distributed stats/thumbnail parity vs a driver-side reference."""

    def test_roundtrip_and_header_tolerance(self):
        from aushape_ray.functions.media import decode_ppm, encode_ppm

        rng = np.random.default_rng(3)
        a = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(a)) == a).all()
        # whitespace variants + comment lines in the header
        raw = b"P6 # comment\n 23\t17 # again\n 255\n" + a.tobytes()
        assert (decode_ppm(raw) == a).all()
        with pytest.raises(ValueError):
            decode_ppm(b"P5 1 1 255\n\x00")

    def test_media_image_stats_matches_reference(self, ray_session):
        import hashlib

        from aushape_ray.functions.media import (decode_ppm, encode_ppm,
                                                 synthesize_ppm)
        from aushape_ray.pipelines.queries import q_media_image_stats

        got = {r["media_id"]: r for r in
               q_media_image_stats("/root/testdata/sf0.001").take_all()}
        ids = pa.table({"doc_id": pa.array(sorted(got), pa.int64())})
        synth = synthesize_ppm(ids)
        assert len(got) == synth.num_rows > 0
        for mid, p in zip(synth.column("media_id").to_pylist(),
                          synth.column("payload").to_pylist()):
            arr = decode_ppm(p)
            r = got[mid]
            assert (r["height"], r["width"]) == arr.shape[:2]
            s, npix = int(arr.sum(dtype=np.int64)), arr.size
            assert r["bright_milli"] == s * 1000 // npix
            sy = max(1, -(-arr.shape[0] // 16))
            sx = max(1, -(-arr.shape[1] // 16))
            thumb = np.ascontiguousarray(arr[::sy, ::sx])
            assert r["thumb_md5"] == hashlib.md5(
                encode_ppm(thumb)).hexdigest()


class TestWavCodec:
    def test_roundtrip_and_chunk_walk(self):
        import struct

        from aushape_ray.functions.media import decode_wav, encode_wav

        x = (np.sin(np.arange(777) / 5) * 12000).astype(np.int16)
        y, rate = decode_wav(encode_wav(x, rate=8000))
        assert rate == 8000 and (y == x).all()
        # extra LIST chunk before data must be skipped (odd size padded)
        raw = encode_wav(x)
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        patched = raw[:12] + extra + raw[12:]
        y2, _ = decode_wav(patched)
        assert (y2 == x).all()
        with pytest.raises(ValueError):
            decode_wav(b"RIFFxxxxAIFF")

    def test_media_audio_stats_matches_reference(self, ray_session):
        from aushape_ray.functions.media import decode_wav, synthesize_wav
        from aushape_ray.pipelines.queries import q_media_audio_stats

        got = {r["media_id"]: r for r in
               q_media_audio_stats("/root/testdata/sf0.001").take_all()}
        ids = pa.table({"doc_id": pa.array(sorted(got), pa.int64())})
        synth = synthesize_wav(ids)
        assert len(got) == synth.num_rows > 0
        for mid, p in zip(synth.column("media_id").to_pylist(),
                          synth.column("payload").to_pylist()):
            x, rate = decode_wav(p)
            xi = x.astype(np.int64)
            r = got[mid]
            assert r["n_samples"] == len(x)
            assert r["dur_us"] == len(x) * 1_000_000 // rate
            assert r["sum_abs"] == int(np.abs(xi).sum())
            assert r["energy"] == int((xi * xi).sum())
            s = np.sign(xi[xi != 0])
            assert r["zero_cross"] == int((s[1:] != s[:-1]).sum())


class TestY4mCodec:
    def test_roundtrip_and_header(self):
        from aushape_ray.functions.media import decode_y4m, encode_y4m

        rng = np.random.default_rng(9)
        f = rng.integers(0, 256, (5, 10, 14), dtype=np.uint8)
        g, fps = decode_y4m(encode_y4m(f, fps=30))
        assert fps == 30 and (g == f).all()
        with pytest.raises(ValueError):
            decode_y4m(b"AVI nope\n")
        with pytest.raises(ValueError):
            encode_y4m(f[:, :9, :])  # odd height

    def test_media_video_frames_matches_reference(self, ray_session):
        import hashlib

        from aushape_ray.functions.media import decode_y4m, synthesize_y4m
        from aushape_ray.pipelines.queries import q_media_video_frames

        rows = q_media_video_frames("/root/testdata/sf0.001").take_all()
        got = {(r["media_id"], r["frame_idx"]): r for r in rows}
        ids = sorted({r["media_id"] for r in rows})
        synth = synthesize_y4m(
            pa.table({"doc_id": pa.array(ids, pa.int64())}))
        assert len(ids) > 0
        n_expected = 0
        for mid, p in zip(synth.column("media_id").to_pylist(),
                          synth.column("payload").to_pylist()):
            frames, _ = decode_y4m(p)
            picks = list(range(0, len(frames), 3))[:4]
            n_expected += len(picks)
            for fi in picks:
                r = got[(mid, fi)]
                assert r["n_frames"] == len(frames)
                assert r["luma_sum"] == int(
                    frames[fi].sum(dtype=np.int64))
                assert r["frame_md5"] == hashlib.md5(
                    frames[fi].tobytes()).hexdigest()
        assert len(rows) == n_expected
