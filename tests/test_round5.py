"""Round-5 fixes: IVF recall via margin-ordered multi-probe + exact
re-rank (verdict r4 #1), media sniff hardening (ADVICE r4), and
kcenter_select edge cases (ADVICE r4)."""
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF001 = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- IVF recall

def test_ivf_hyperplane_recall_meets_bar(ray_session):
    """Margin-ordered multi-probe LSH + exact_rerank must hold recall@10
    >= 0.9 at sf0.01 (verdict r4 item 1; was 50% with Hamming-1 probes)."""
    from aushape_ray.pipelines.queries import q_ann_ivf_recall

    row = q_ann_ivf_recall(SF001).to_pylist()[0]
    assert row["recall_pct"] >= 90, row
    assert 0 < row["probed_pct"] < 100, row


def test_ivf_kmeans_recall_meets_bar(ray_session):
    """Learned-quantizer IVF (nprobe=6) + exact_rerank must hold recall@10
    >= 0.9 at sf0.01 (verdict r4 item 1; was 72% with nprobe=2)."""
    from aushape_ray.pipelines.queries import q_ann_ivf_kmeans_recall

    row = q_ann_ivf_kmeans_recall(SF001).to_pylist()[0]
    assert row["recall_pct"] >= 90, row
    # the learned quantizer must reach the bar probing strictly fewer
    # buckets than the hyperplane baseline needs
    assert row["probed_pct"] < 50, row


# --------------------------------------------------------------- media sniff

def _gif(with_gct: bool) -> bytes:
    packed = (0x80 | 0x01) if with_gct else 0x00
    hdr = b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([packed, 0, 0])
    gct = bytes(12) if with_gct else b""   # N=1 -> 3 * 2^(1+1) = 12 bytes
    return hdr + gct + b"\x2c" + bytes(10)


def test_gif_sniff_with_global_color_table():
    """A structurally valid GIF whose GCT flag is set (the common case for
    real encoders incl. PIL) must sniff as gif: the block introducer lives
    AFTER the color table, not at byte 13 (ADVICE r4 medium)."""
    from aushape_ray.functions.media import sniff_format

    assert sniff_format(_gif(with_gct=True)) == "gif"
    assert sniff_format(_gif(with_gct=False)) == "gif"


def test_gif_sniff_still_rejects_text():
    from aushape_ray.functions.media import sniff_format

    assert sniff_format(b"GIF87a is an image format from 1987, not text") \
        is None
    assert sniff_format(b"GIF89a") is None  # truncated


@pytest.mark.skipif(
    not __import__("aushape_ray.functions.media", fromlist=["HAVE_PIL"]
                   ).HAVE_PIL, reason="Pillow not installed")
def test_gif_sniff_matches_pil_output():
    """A PIL-saved GIF (which always writes a GCT) must sniff as gif."""
    import io

    from PIL import Image

    from aushape_ray.functions.media import sniff_format

    buf = io.BytesIO()
    Image.new("P", (4, 4)).save(buf, format="GIF")
    assert sniff_format(buf.getvalue()) == "gif"


def test_wav_sniff_tolerates_leading_chunks():
    """Spec-legal RIFF/WAVE with a LIST (or bext) chunk before 'fmt ' must
    still sniff as wav and decode (ADVICE r4 low)."""
    from aushape_ray.functions.media import (decode_wav, encode_wav,
                                             sniff_format)

    wav = encode_wav(np.zeros(16, np.int16))
    assert sniff_format(wav) == "wav"
    bwf = wav[:12] + b"LIST" + struct.pack("<I", 4) + b"INFO" + wav[12:]
    assert sniff_format(bwf) == "wav"
    samples, rate = decode_wav(bwf)
    assert len(samples) == 16 and rate == 16000
    # RIFF/WAVE with no fmt chunk in the first few headers: not wav
    assert sniff_format(b"RIFF" + struct.pack("<I", 4) + b"WAVE") is None


# ------------------------------------------------------------- kcenter edges

def test_kcenter_empty_dataset_returns_empty(ray_session):
    import ray

    from aushape_ray.functions.ann import kcenter_select

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    assert kcenter_select(ds, k=4) == []


def test_kcenter_k_exceeding_distinct_points_stops_early(ray_session):
    """k > #distinct points must not re-pick already-selected ids
    (ADVICE r4 low): with 3 distinct vectors and k=8, exactly 3 picks."""
    import ray

    from aushape_ray.functions.ann import kcenter_select

    vecs = [[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]] * 2  # 6 rows, 3 distinct
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(list(range(6)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float64())),
    }))
    picks = kcenter_select(ds, k=8)
    got = [p["vec_id"] for p in picks]
    assert len(got) == len(set(got)) == 3, picks


# ------------------------------------------- salted path without materialize

def test_build_events_has_no_materialize():
    """Verdict r4 item 2: the designed-in materialization is gone — the
    salted path streams through a merge-or-pass groupby instead."""
    import inspect

    from aushape_ray.pipelines import events_pipeline

    src = inspect.getsource(events_pipeline.build_events)
    assert ".materialize()" not in src


def test_salted_sink_side_channel_matches_oracle(ray_session, tiny_transcripts,
                                                 oracle_events, tmp_path):
    """The deferred-merge salted build + write_routed side-channel must
    produce byte-identical routed rows and counts vs the oracle: finished
    events go straight to sink files, only partials take the second
    groupby."""
    import pyarrow.parquet as pq

    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.oracle import sink_counts as oracle_sink_counts
    from aushape_ray.pipelines.events_pipeline import build_events, write_routed

    cfg = PipelineConfig(num_parts=16, salt_threshold=40, n_salts=4)
    ds = build_events(ray.data.from_arrow(tiny_transcripts), cfg,
                      defer_partial_merge=True)
    assert getattr(ds, "_aushape_has_partials", False)
    out = str(tmp_path / "routed")
    counts = write_routed(ds, out, cfg)
    assert counts == oracle_sink_counts(oracle_events)

    got = {}
    for sink, _n in counts.items():
        t = pq.read_table(f"{out}/sink={sink}")
        for r in t.to_pylist():
            r["sink"] = sink
            got[r["conv_id"]] = r
    exp = {e["conv_id"]: e for e in oracle_events}
    assert len(got) == len(exp)
    for cid, e in exp.items():
        assert got[cid]["doc"] == e["doc"], cid
        assert got[cid]["sink"] == e["sink"], cid


def test_deferred_merge_without_hot_convs_is_plain(ray_session,
                                                   tiny_transcripts, tmp_path):
    """defer_partial_merge with no hot conversations degrades to the plain
    EVENT_SCHEMA path (write_routed's write_parquet branch)."""
    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import build_events, write_routed

    cfg = PipelineConfig(num_parts=8)  # salt_threshold=None
    ds = build_events(ray.data.from_arrow(tiny_transcripts), cfg,
                      defer_partial_merge=True)
    assert not getattr(ds, "_aushape_has_partials", False)
    counts = write_routed(ds, str(tmp_path / "routed2"), cfg)
    assert sum(counts.values()) > 0


def test_salted_events_per_doc_respected_in_side_channel(ray_session,
                                                         tiny_transcripts,
                                                         tmp_path):
    """ParquetSinkWriter honors events_per_doc as an upper bound per file
    (the reference's doc-close rule, lib/conv.c:121-125)."""
    import glob

    import pyarrow.parquet as pq

    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.pipelines.events_pipeline import build_events, write_routed

    cfg = PipelineConfig(num_parts=16, salt_threshold=40, n_salts=4,
                         events_per_doc=7)
    ds = build_events(ray.data.from_arrow(tiny_transcripts), cfg,
                      defer_partial_merge=True)
    out = str(tmp_path / "routed3")
    write_routed(ds, out, cfg)
    for f in glob.glob(f"{out}/sink=*/*.parquet"):
        assert pq.ParquetFile(f).metadata.num_rows <= 7, f


def test_null_conv_id_with_salting(ray_session):
    """Null conv_ids are one conversation (oracle dict-key semantics) and
    must survive add_part's vectorized hashing and the salted path (found
    while removing the salted materialize: indices with nulls made the
    part_of gather crash)."""
    import ray.data

    from aushape_ray.config import PipelineConfig
    from aushape_ray.oracle import assemble_events
    from aushape_ray.pipelines.events_pipeline import build_events

    rows = [(None if i < 50 else "c1", i, "user",
             f"node=h type=MSG i={i}", "", i + 1) for i in range(100)]
    tb = pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "text": pa.array([r[3] for r in rows], pa.string()),
        "tool": pa.array([r[4] for r in rows], pa.string()),
        "ts": pa.array([r[5] for r in rows], pa.timestamp("us")),
    })
    oracle = {e["conv_id"]: e for e in assemble_events(tb)}
    assert len(oracle) == 2 and None in oracle
    for kw in ({}, {"salt_threshold": 20, "n_salts": 4}):
        cfg = PipelineConfig(num_parts=4, **kw)
        got = build_events(ray.data.from_arrow(tb), cfg).take_all()
        assert len(got) == 2, kw
        for r in got:
            assert r["doc"] == oracle[r["conv_id"]]["doc"], (kw, r["conv_id"])


# ---------------------------------------------- vectorized shingling/verify

def test_shingles_flat_parity_with_per_doc():
    """shingles_flat(unique=True) is value-identical per doc to _shingles
    (verdict r4 item 3), including the <=k-byte md5 fallback, empty and
    null docs, and multi-byte UTF-8."""
    import random

    from aushape_ray.functions.dedup import _shingles, shingles_flat

    random.seed(11)
    texts = [None, "", "ab", "abcde", "abcdef", "héllo wörld",
             "the quick brown fox " * 40]
    for _ in range(200):
        n = random.choice([0, 2, 5, 6, 30, 300])
        texts.append("".join(random.choice("abcd eé世")
                             for _ in range(n)))
    col = pa.array(texts, pa.string())
    flat, off = shingles_flat(col, unique=True)
    for i, t in enumerate(texts):
        assert np.array_equal(_shingles(t or ""), flat[off[i]:off[i + 1]]), i


def test_minhash_signature_parity_nonunique_path():
    """MinHasher's flat nonunique path (min over the shingle multiset)
    must produce signatures identical to per-doc signature() over the
    unique set."""
    from aushape_ray.functions.dedup import MinHasher

    texts = ["the cat sat on the mat " * 8, "abc", "", "xyzzy " * 100,
             "one two three four five six seven eight nine ten " * 3]
    batch = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    mh = MinHasher()
    got = np.stack([np.asarray(x, np.int64) for x in
                    mh(batch).column("minhash").to_pylist()]).astype(np.uint64)
    want = np.stack([mh.signature(t) for t in texts])
    assert np.array_equal(got, want)


def test_verify_prefilter_is_lossless(ray_session):
    """verify_pairs_jaccard(min_jaccard=t) must return exactly the pairs
    the unfiltered run keeps at jaccard >= t (the size bound can only cut
    below-threshold pairs)."""
    import ray.data

    from aushape_ray.functions.dedup import verify_pairs_jaccard

    texts = {
        1: "aaaa bbbb cccc dddd eeee ffff gggg",
        2: "aaaa bbbb cccc dddd eeee ffff gggh",   # near-dup of 1
        3: "completely different content here zz",
        4: "aaaa",                                  # tiny -> size-bound cut
    }
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string()),
    }))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([1, 1, 1, 99], pa.int64()),
        "doc_b": pa.array([2, 3, 4, 2], pa.int64()),  # 99 missing -> drop
    }))
    base = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in verify_pairs_jaccard(pairs, docs).take_all()}
    fil = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in verify_pairs_jaccard(pairs, docs,
                                         min_jaccard=0.5).take_all()}
    want = {k: v for k, v in base.items() if v >= 0.5}
    assert fil.keys() >= want.keys()
    for k2, v in want.items():
        assert abs(fil[k2] - v) < 1e-12
    assert all(v >= 0.0 for v in fil.values())
    assert (1, 4) not in fil  # size bound cut it
    assert (99, 2) not in base and (99, 2) not in fil


# ------------------------------------------------- t_similar_convs_exact

def test_similar_convs_exact_matches_bruteforce(ray_session, tmp_path):
    """Lossless prefix-join discovery (verdict r4 item 7): clusters on a
    CONSTRUCTED corpus of near-duplicate kind chains must equal the
    brute-force union-find exactly — no LSH recall loss possible."""
    from aushape_ray.fixtures import transcripts_path, write_shards
    from aushape_ray.functions.dedup import _shingles
    from aushape_ray.pipelines.queries import q_t_similar_convs_exact

    # 6 families x 5 distinct variants, plus singles.  A variant mutates
    # the TAIL of a 40-kind chain so byte-5-gram Jaccard stays >= 0.8
    # within a family and ~0 across families.
    kinds = ["SYSCALL", "PATH", "MSG", "AVC", "LOGIN", "CWD", "EXECVE"]
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": [],
            "tool": [], "ts": []}
    chains: dict[str, str] = {}
    cid_n = 0
    for fam in range(6):
        base = [kinds[(fam * 3 + i * i) % len(kinds)] for i in range(40)]
        for var in range(5):
            chain = list(base)
            chain[39 - var] = kinds[(fam + var + 1) % len(kinds)]
            # two conversations per variant (identical chains collapse)
            for dup in range(2):
                cid = f"c{cid_n:04d}"
                cid_n += 1
                chains.setdefault(",".join(chain), cid)
                for t, k in enumerate(chain):
                    rows["conv_id"].append(cid)
                    rows["turn_idx"].append(t)
                    rows["role"].append("user")
                    rows["text"].append(f"node=h type={k} i={t}")
                    rows["tool"].append("")
                    rows["ts"].append(cid_n * 100 + t)
    for s in range(8):  # unrelated singles
        cid = f"s{s:04d}"
        for t in range(10):
            rows["conv_id"].append(cid)
            rows["turn_idx"].append(t)
            rows["role"].append("user")
            rows["text"].append(f"node=h type=UNIQ{s}K{t} i={t}")
            rows["tool"].append("")
            rows["ts"].append(90_000 + s * 100 + t)
    table = pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "role": pa.array(rows["role"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "tool": pa.array(rows["tool"], pa.string()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
    })
    sf_dir = str(tmp_path / "sfx")
    write_shards(table, transcripts_path(sf_dir), 4)

    # brute force over distinct chains (same reduction as the query)
    import collections

    per_conv: dict[str, list] = collections.defaultdict(list)
    for c, t, x in zip(rows["conv_id"], rows["turn_idx"], rows["text"]):
        per_conv[c].append((t, x.split("type=")[1].split(" ")[0]))
    rep: dict[str, str] = {}
    members: dict[str, int] = collections.defaultdict(int)
    for c, tl in per_conv.items():
        seq = ",".join(k for _t, k in sorted(tl))
        members[seq] += 1
        if seq not in rep or c < rep[seq]:
            rep[seq] = c
    sh = {c: set(_shingles(s).tolist()) for s, c in rep.items()}
    n_mem = {rep[s]: n for s, n in members.items()}
    convs = sorted(sh)
    parent = {c: c for c in convs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(convs):
        for b in convs[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.8:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    comps: dict[str, list] = collections.defaultdict(list)
    for c in convs:
        comps[find(c)].append(c)
    want = {(min(v), len(v), sum(n_mem[c] for c in v))
            for v in comps.values() if len(v) > 1}
    assert len(want) == 6  # one cluster per family

    got_df = q_t_similar_convs_exact(sf_dir).to_pandas()
    got = {(r.rep_conv, r.n_chains, r.n_convs) for r in got_df.itertuples()}
    assert got == want


# --- schema-stable empty pair joins (sf0.1 gate regression) -------------
# At sf>=0.1 every term of the synthetic vocabulary exceeds the DF caps of
# doc_shared_term_pairs / doc_tfidf_pairs, so both results are
# intentionally empty — and must still surface their (doc_a, doc_b[, n])
# column contract instead of a schema-less no-column frame.

def _fully_pruned_docs():
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": "aaa bbb ccc"} for i in range(20)])


def test_shared_term_pairs_empty_keeps_schema(ray_session):
    from aushape_ray.functions.textops import shared_term_pairs

    ds = shared_term_pairs(_fully_pruned_docs(), min_shared=2, max_df=3)
    sch = ds.schema(fetch_if_missing=True)
    assert sch is not None
    assert list(sch.names) == ["doc_a", "doc_b", "n_shared"]
    assert ds.count() == 0


def test_tfidf_pairs_empty_keeps_schema(ray_session):
    from aushape_ray.functions.textops import tfidf_pairs

    ds = tfidf_pairs(_fully_pruned_docs(), 0.9, max_df=3)
    sch = ds.schema(fetch_if_missing=True)
    assert sch is not None
    assert list(sch.names) == ["doc_a", "doc_b"]
    assert ds.count() == 0


def test_shared_term_pairs_nonempty_unaffected(ray_session):
    import ray.data

    from aushape_ray.functions.textops import shared_term_pairs

    docs = ray.data.from_items(
        [{"doc_id": i, "text": "alpha beta gamma delta"} for i in range(3)]
        + [{"doc_id": 10 + i, "text": "zeta eta theta"} for i in range(2)])
    df = shared_term_pairs(docs, min_shared=3, max_df=10).to_pandas()
    got = {(r.doc_a, r.doc_b, r.n_shared) for r in df.itertuples()}
    assert got == {(0, 1, 4), (0, 2, 4), (1, 2, 4), (10, 11, 3)}


def test_jaccard_prefix_tiled_emission_parity(ray_session):
    """The tiled emit_pairs path (tile_elems small enough that every gram
    run is split into many row-blocks, including rows=1 blocks) must
    produce the identical verified pair set as whole-triangle emission."""
    import random

    import ray.data

    from aushape_ray.functions.dedup import jaccard_pairs_prefix

    rng = random.Random(7)
    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten"]
    docs = []
    for i in range(40):
        words = base[i % 2].split()
        if rng.random() < 0.6:  # small deviation -> near-dup families
            words[rng.randrange(len(words))] = f"mut{rng.randrange(5)}"
        docs.append({"doc_id": i, "text": " ".join(words)})
    ds = ray.data.from_items(docs)

    def pairset(tile_elems):
        df = jaccard_pairs_prefix(ds, threshold=0.5, n_parts=4,
                                  tile_elems=tile_elems).to_pandas()
        return {(r.doc_a, r.doc_b, round(r.jaccard, 12))
                for r in df.itertuples()}

    whole = pairset(10**9)   # every run fits one triangle
    tiny = pairset(1)        # every run forced through 1-row tiles
    mid = pairset(64)
    assert whole == tiny == mid
    assert len(whole) > 0


# --- jsonenc: orjson fast path must be byte-identical to stdlib ---------

def test_jsonenc_backend_parity_corpus(ray_session, tiny_transcripts):
    """encode_doc/_bytes (orjson when present) must be byte-identical to
    json.dumps(ensure_ascii=False, separators=(",", ":")) over real event
    docs and adversarial values; out-of-contract values (ints beyond
    64-bit) take the stdlib fallback, so output never diverges."""
    import json

    from aushape_ray.jsonenc import encode_doc, encode_doc_bytes
    from aushape_ray.oracle import assemble_events

    std = json.JSONEncoder(ensure_ascii=False, separators=(",", ":")).encode
    docs = [json.loads(e["doc"]) for e in assemble_events(tiny_transcripts)]
    cases = docs + [
        {"q": 'quote"backslash\\'}, {"c": "ctrl\x01\x1f\x7f"},
        {"nl": "a\nb\tc\rd\x08e\x0cf"}, {"u": "héllo — 日本語 🚀"},
        {"i": 2**63 - 1}, {"neg": -2**63}, {"big": 2**80},  # fallback path
        {"nested": {"k": ["a", 1, None, True, False, {"z": ""}]}},
        {}, {"e": []}, {"s": ""},
    ]
    assert len(docs) > 0
    for c in cases:
        want = std(c)
        assert encode_doc(c) == want
        assert encode_doc_bytes(c) == want.encode("utf-8")


# --- small-universe bitset verify + 128-bit mask emit filter -------------

def _chain_corpus(n_docs=60, seed=3):
    """Kind-chain-like corpus: comma-joined tokens from a 4-symbol
    alphabet -> tiny 5-byte-gram vocabulary (the shape that trips the
    bitset kernel), with planted near-dup families."""
    import random

    rng = random.Random(seed)
    kinds = ["dialog", "tool", "error", "meta"]
    docs = []
    base = [",".join(rng.choice(kinds) for _ in range(rng.randint(8, 20)))
            for _ in range(n_docs // 3)]
    for i in range(n_docs):
        if i < len(base):
            docs.append(base[i])
        else:  # mutate an existing chain: near-dup family member
            toks = base[i % len(base)].split(",")
            toks[rng.randrange(len(toks))] = rng.choice(kinds)
            docs.append(",".join(toks))
    return [{"doc_id": i, "text": t} for i, t in enumerate(docs)]


def test_verify_bitset_kernel_parity(ray_session):
    """The small-universe bitset kernel (popcount over per-doc bitsets)
    must be value-identical to the general searchsorted path on the SAME
    all-pairs candidate list — both against the scalar jaccard()
    reference.  The all-pairs list guarantees len(todo) >= 4*len(docs)
    per bucket, so the vocab probe actually fires."""
    import ray.data

    from aushape_ray.functions.dedup import jaccard, verify_pairs_jaccard

    rows = _chain_corpus()
    docs = ray.data.from_items(rows)
    texts = {r["doc_id"]: r["text"] for r in rows}
    n = len(rows)
    prs = [{"doc_a": a, "doc_b": b} for a in range(n)
           for b in range(a + 1, n)]
    pairs = ray.data.from_items(prs).repartition(3)

    def runs(cap):
        out = verify_pairs_jaccard(pairs, docs, n_buckets=2,
                                   bitset_max_vocab=cap).take_all()
        return {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out}

    fast = runs(4096)   # bitset path (chain vocab is tiny)
    slow = runs(0)      # forced general path
    assert set(fast) == set(slow) == {(p["doc_a"], p["doc_b"])
                                      for p in prs}
    for k, j in fast.items():
        assert abs(j - slow[k]) < 1e-12, (k, j, slow[k])
        want = jaccard(texts[k[0]], texts[k[1]])
        assert abs(j - want) < 1e-12, (k, j, want)


def test_prefix_join_mask_filter_lossless_on_chains(ray_session):
    """jaccard_pairs_prefix with the 128-bit mask emit filter must still
    equal the uncapped brute force on a low-entropy chain corpus — the
    shape where the mask actually prunes (large-vocab text corpora are
    covered by test_jaccard_pairs_prefix_matches_exact)."""
    import ray.data

    from aushape_ray.functions.dedup import (jaccard_pairs_exact,
                                             jaccard_pairs_prefix)

    docs = ray.data.from_items(_chain_corpus(n_docs=80, seed=11))
    exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
             for r in jaccard_pairs_exact(
                 docs, threshold=0.6, n_parts=4).take_all()}
    pref = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in jaccard_pairs_prefix(
                docs, threshold=0.6, n_parts=4).take_all()}
    assert len(exact) >= 5  # mutated families survive t=0.6
    assert set(pref) == set(exact)
    for k, j in pref.items():
        assert abs(j - exact[k]) < 1e-12, (k, j, exact[k])


def test_prefix_join_exact_threshold_boundary(ray_session):
    """Pairs whose Jaccard is EXACTLY the threshold must be returned.
    IEEE chains like ceil(0.8/1.8*63) land one above the true integer
    bound, so un-guarded filters (prefix length, length ratio, alpha,
    min_jaccard) silently drop exact-boundary pairs — found on the sf0.1
    chain corpus (3,801 dropped by alpha; 10,506 recovered overall once
    every filter was _eps_down-guarded).  This pins two real offenders
    from that corpus plus the containment shape min/max == t."""
    import ray.data

    from aushape_ray.functions.dedup import (jaccard, jaccard_pairs_prefix,
                                             verify_pairs_jaccard)

    ta = "CONFIG,MSG,OBJ_PID,MSG,MSG,MSG,SUMMARY,CWD"
    tb = "CONFIG,MSG,MSG,MSG,MSG,SUMMARY,CWD,OBJ_PID,MSG,MSG"
    t = jaccard(ta, tb)
    assert t == 0.8  # exact-boundary reproducer (sizes 31/32, inter 28)

    rows = [{"doc_id": 0, "text": ta}, {"doc_id": 1, "text": tb},
            {"doc_id": 2, "text": "AVC,SYSCALL,EOE"},
            {"doc_id": 3, "text": "PATH,PATH,PATH,CWD"}]
    docs = ray.data.from_items(rows)
    got = {(r["doc_a"], r["doc_b"])
           for r in jaccard_pairs_prefix(docs, threshold=t,
                                         n_parts=2).take_all()}
    assert (0, 1) in got

    pairs = ray.data.from_items([{"doc_a": 0, "doc_b": 1}])
    out = verify_pairs_jaccard(pairs, docs, n_buckets=2,
                               min_jaccard=t).take_all()
    assert len(out) == 1 and out[0]["jaccard"] == t


def test_doc_cap_per_source_merge_across_batches(ray_session):
    """cap-per-source partials are a mergeable top-n: with one source's
    smallest doc_ids scattered across many batches, each batch keeps its
    local 10 but the combine must return the GLOBAL 10 smallest."""
    import ray.data

    from aushape_ray.pipelines.queries import q_doc_cap_per_source

    import pyarrow.parquet as pq
    import tempfile, os

    rows = []
    # source 'a': 40 docs, ids interleaved so every batch holds some of
    # the global-smallest; source 'b': fewer than the cap (all kept)
    for i in range(40):
        rows.append({"doc_id": 1000 - i * 7, "text": "x", "lang": "en",
                     "source": "a", "n_chars": 1})
    for i in range(4):
        rows.append({"doc_id": 5000 + i, "text": "x", "lang": "en",
                     "source": "b", "n_chars": 1})
    with tempfile.TemporaryDirectory() as d:
        pa_tbl = pa.Table.from_pylist(rows)
        # many tiny row groups -> many Ray blocks/batches
        pq.write_table(pa_tbl, os.path.join(d, "documents.parquet"),
                       row_group_size=5)
        out = q_doc_cap_per_source(d).take_all()
    got_a = sorted(r["doc_id"] for r in out if r["source"] == "a")
    want_a = sorted(sorted(1000 - i * 7 for i in range(40))[:10])
    assert got_a == want_a
    got_b = sorted(r["doc_id"] for r in out if r["source"] == "b")
    assert got_b == [5000, 5001, 5002, 5003]


def test_events_window_distinct_exactness(ray_session):
    """window-distinct: a user appearing many times in one window counts
    once; the same user in two windows counts in both; parity with a
    scalar reference on random data across multiple batches."""
    import random
    import tempfile, os

    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_events_window_distinct

    rng = random.Random(5)
    W = 3_600_000_000
    rows = []
    for _ in range(3000):
        rows.append({"ts": rng.randrange(0, 24) * W + rng.randrange(W),
                     "user_id": rng.randrange(50),
                     "event_type": "t", "value": 0.0, "props": "{}",
                     "event_id": len(rows)})
    want = {}
    for r in rows:
        want.setdefault((r["ts"] // W) * W, set()).add(r["user_id"])
    tbl = pa.Table.from_pylist(rows).set_column(
        0, "ts", pa.array([r["ts"] for r in rows],
                          pa.int64()).cast(pa.timestamp("us")))
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"),
                       row_group_size=100)
        out = q_events_window_distinct(d).take_all()
    got = {r["window_start"].timestamp() * 1e6: r["n_users"] for r in out}
    assert len(got) == len(want)
    for w, users in want.items():
        assert got[float(w)] == len(users), (w, len(users))


def test_cluster_pairs_star_reduce_parity(ray_session):
    """cluster_pairs(star_reduce=True) must return EXACTLY the same
    (doc_id, cluster_id) rows as the unreduced path and as a scalar
    union-find, on random graphs whose components span many blocks (the
    reduction is per-block; only the union of stars sees the whole
    component), including chains (worst case for pointer jumping),
    dense cliques (the case the reduction exists for), and self-loops
    (singleton components must keep their row)."""
    import random

    import ray.data

    rng = random.Random(99)
    edges = []
    # chains: 40-node paths force cross-block label propagation
    for c in range(5):
        base = c * 1000
        edges += [(base + i, base + i + 1) for i in range(40)]
    # dense cliques
    for c in range(3):
        base = 10_000 + c * 100
        ids = [base + i for i in range(15)]
        edges += [(x, y) for i, x in enumerate(ids) for y in ids[i + 1:]]
    # random sparse edges
    edges += [(rng.randrange(500), rng.randrange(500)) for _ in range(300)]
    edges = [(a, b) for a, b in edges if a != b]
    edges.append((77777, 77777))  # self-loop singleton
    rng.shuffle(edges)

    # scalar union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}

    from aushape_ray.functions.dedup import cluster_pairs

    ds = ray.data.from_items(
        [{"doc_a": a, "doc_b": b} for a, b in edges]).repartition(7)

    def run(star):
        out = cluster_pairs(ds, n_buckets=4, small_threshold=10,
                            star_reduce=star).take_all()
        return {r["doc_id"]: r["cluster_id"] for r in out}

    got_star = run(True)
    got_plain = run(False)
    assert got_star == got_plain == want


def _scalar_split(doc_id: int) -> str:
    hv = ((doc_id % 2**32 + 2**32) % 2**32) * 2654435761 % 2**32
    return ("train" if hv < 3_435_973_836
            else "val" if hv < 3_865_470_566 else "test")


def test_doc_split_family_bruteforce(ray_session, tmp_path):
    """The split trio against scalar references on a constructed corpus:
    doc_split_assign == per-doc scalar hash split; doc_split_group gives
    every doc of a source the split of the source's MIN doc_id (and is
    leakage-free by construction when near-dups stay within a source);
    doc_split_leakage == brute-force 5-gram Jaccard >= 0.5 pairs whose
    scalar splits differ, counted per (split_a, split_b)."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aushape_ray.functions.dedup import _shingles
    from aushape_ray.pipelines.queries import (q_doc_split_assign,
                                               q_doc_split_group,
                                               q_doc_split_leakage)

    rng = random.Random(4242)
    alpha = "abcdefghij "
    texts, sources = [], []
    for i in range(40):
        texts.append("".join(rng.choice(alpha) for _ in range(120)))
        sources.append(f"src{i % 6}")
    # plant near-dups across MANY doc_ids so some pairs straddle splits
    for i in range(14):
        src = list(texts[i])
        for _ in range(4):
            src[rng.randrange(len(src))] = rng.choice(alpha)
        texts.append("".join(src))
        sources.append(f"src{rng.randrange(6)}")
    # spread doc_ids widely so all three splits are populated
    ids = [i * 104729 + 17 for i in range(len(texts))]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "source": pa.array(sources, pa.string()),
                             "text": pa.array(texts, pa.string())}),
                   tmp_path / "documents.parquet")
    sf = str(tmp_path)

    # assign: per-doc scalar parity, all three splits present
    got = {r["doc_id"]: r["split"]
           for r in q_doc_split_assign(sf).take_all()}
    want = {i: _scalar_split(i) for i in ids}
    assert got == want
    assert set(want.values()) == {"train", "val", "test"}

    # group: split(doc) == split(min doc_id of its source)
    gmin = {}
    for i, s in zip(ids, sources):
        gmin[s] = min(gmin.get(s, i), i)
    gotg = {r["doc_id"]: (r["source"], r["split"])
            for r in q_doc_split_group(sf).take_all()}
    assert gotg == {i: (s, _scalar_split(gmin[s]))
                    for i, s in zip(ids, sources)}

    # leakage: brute-force jaccard pairs straddling scalar splits
    sh = [set(_shingles(t).tolist()) for t in texts]
    combos = {}
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            inter = len(sh[x] & sh[y])
            if not inter:
                continue
            j = inter / (len(sh[x]) + len(sh[y]) - inter)
            if j >= 0.5:
                sx, sy = _scalar_split(ids[x]), _scalar_split(ids[y])
                if sx != sy:
                    order = ["train", "val", "test"]
                    lo, hi = sorted((sx, sy), key=order.index)
                    combos[(lo, hi)] = combos.get((lo, hi), 0) + 1
    gotl = {(r["split_a"], r["split_b"]): r["n_pairs"]
            for r in q_doc_split_leakage(sf).take_all()}
    assert combos, "corpus must plant at least one straddling pair"
    assert gotl == combos


def test_doc_ngram_novelty_scalar_parity(ray_session, tmp_path):
    """doc_ngram_novelty against a scalar set-based reference on a
    corpus with adversarial whitespace (double spaces, tabs, newlines,
    leading/trailing runs), planted shared 8-grams, exact-dup docs
    (their every gram has df >= 2), and sub-8-word docs (must emit no
    row) — proving the flat-kernel word/gram semantics and the df==1
    credit are exact, not corpus-shaped."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_doc_ngram_novelty

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(25):
        words = [rng.choice(vocab) for _ in range(rng.randrange(8, 40))]
        sep = [" ", "  ", "\t", "\n", " \t "][rng.randrange(5)]
        texts.append(sep.join(words))
    shared = " ".join(vocab[:12])          # 12 words -> 5 shared 8-grams
    texts.append(shared + " aa bb cc")
    texts.append("zz " + shared)           # overlapping copies of shared
    texts.append(texts[0])                 # exact dup: all grams df>=2
    texts.append("  " + texts[1] + "\n")   # dup modulo edge whitespace
    texts.append("only seven words live in here now")  # 7 words: no row
    texts.append("")                       # empty: no row
    ids = [i * 37 + 5 for i in range(len(texts))]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())}),
                   tmp_path / "documents.parquet")

    # scalar reference: whitespace-run words, string 8-gram sets
    grams = {}
    for i, t in zip(ids, texts):
        ws = t.split()
        g = {" ".join(ws[j:j + 8]) for j in range(len(ws) - 7)}
        if g:
            grams[i] = g
    from collections import Counter

    dfreq = Counter(g for s in grams.values() for g in s)
    want = {i: (len(s), sum(1 for g in s if dfreq[g] == 1))
            for i, s in grams.items()}

    got = {r["doc_id"]: (r["n_grams"], r["n_novel"])
           for r in q_doc_ngram_novelty(str(tmp_path)).take_all()}
    assert got == want
    # the planted structure actually exercised the interesting cases
    assert ids[25] in got and got[ids[25]][1] < got[ids[25]][0]
    assert got[ids[27]][1] == 0 and got[ids[28]][1] == 0
    assert ids[29] not in got and ids[30] not in got


def _duckdb_views(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def test_nation_revenue_matches_oracle(ray_session):
    """Multi-way join (TPC-H Q5 shape): exact parity with the DuckDB
    oracle at sf0.001 — local-supplier condition, date window, cents."""
    from aushape_ray.pipelines.queries import (q_nation_revenue,
                                               sql_nation_revenue)

    sf = "/root/testdata/sf0.001"
    got = q_nation_revenue(sf).to_pandas() \
        .sort_values("n_name", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_nation_revenue()).df() \
        .sort_values("n_name", ignore_index=True)
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert got["n_items"].astype(int).tolist() == exp["n_items"].tolist()
    assert (got["revenue_cents"].astype(int).tolist()
            == exp["revenue_cents"].tolist())
    assert len(got) >= 1  # the ASIA/1996 window is non-degenerate


def test_doc_len_filter_pct_matches_oracle(ray_session):
    """Two-phase global-percentile filter: the exact-order-statistic
    thresholds and the kept set match the SQL replica at sf0.001."""
    from aushape_ray.pipelines.queries import (q_doc_len_filter_pct,
                                               sql_doc_len_filter_pct)

    sf = "/root/testdata/sf0.001"
    got = q_doc_len_filter_pct(sf).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_doc_len_filter_pct()).df() \
        .sort_values("doc_id", ignore_index=True)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_tokens"].astype(int).tolist() == exp["n_tokens"].tolist()
    # both tails were actually cut (the filter is non-trivial)
    n_docs = _duckdb_views(sf).execute(
        "SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(got) < n_docs


def test_part_brand_revenue_matches_oracle(ray_session):
    """Both-sides-large lineitem x part hash join: exact parity with the
    DuckDB oracle at sf0.001 (this query makes `part` the tenth and last
    input table exercised by the registry)."""
    from aushape_ray.pipelines.queries import (q_part_brand_revenue,
                                               sql_part_brand_revenue)

    sf = "/root/testdata/sf0.001"
    got = q_part_brand_revenue(sf).to_pandas() \
        .sort_values("p_brand", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_part_brand_revenue()).df() \
        .sort_values("p_brand", ignore_index=True)
    assert got["p_brand"].tolist() == exp["p_brand"].tolist()
    assert got["n_items"].astype(int).tolist() == exp["n_items"].tolist()
    assert (got["revenue_cents"].astype(int).tolist()
            == exp["revenue_cents"].tolist())
    assert len(got) > 1


def test_events_pivot_daily_matches_oracle(ray_session):
    """Dynamic-schema pivot: the discovered wide column set and every
    per-day count match DuckDB's dynamic PIVOT at sf0.001."""
    from aushape_ray.pipelines.queries import (q_events_pivot_daily,
                                               sql_events_pivot_daily)

    sf = "/root/testdata/sf0.001"
    got = q_events_pivot_daily(sf).to_pandas() \
        .sort_values("day", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_pivot_daily()).df() \
        .sort_values("day", ignore_index=True)
    assert sorted(got.columns) == sorted(exp.columns)
    exp = exp[got.columns.tolist()]
    assert got["day"].tolist() == exp["day"].tolist()
    for c in got.columns:
        if c == "day":
            continue
        assert got[c].astype(int).tolist() == exp[c].tolist(), c
    assert len(got.columns) >= 3  # the pivot actually widened


def test_events_debounce_matches_oracle(ray_session):
    """Per-key throttle: kept event_ids match the SQL lag replica at
    sf0.001, and the filter is non-trivial in both directions."""
    from aushape_ray.pipelines.queries import (q_events_debounce,
                                               sql_events_debounce)

    sf = "/root/testdata/sf0.001"
    got = sorted(r["event_id"]
                 for r in q_events_debounce(sf).take_all())
    con = _duckdb_views(sf)
    exp = sorted(r[0] for r in con.execute(sql_events_debounce()).fetchall())
    assert got == exp
    n = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert 0 < len(got) < n


def test_orders_size_histogram_matches_oracle(ray_session):
    """Two-level re-keyed aggregation: order-size distribution matches
    the SQL nested-aggregate at sf0.001."""
    from aushape_ray.pipelines.queries import (q_orders_size_histogram,
                                               sql_orders_size_histogram)

    sf = "/root/testdata/sf0.001"
    got = q_orders_size_histogram(sf).to_pandas() \
        .sort_values("n_items", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_orders_size_histogram()).df() \
        .sort_values("n_items", ignore_index=True)
    assert got["n_items"].astype(int).tolist() == exp["n_items"].tolist()
    assert got["n_orders"].astype(int).tolist() == exp["n_orders"].tolist()
    assert len(got) > 3  # a real distribution, not a point mass


def test_events_rollup_matches_oracle(ray_session):
    """ROLLUP(event_type, day): detail + per-type subtotal + grand total
    rows all match DuckDB, including NULL padding, at sf0.001."""
    from aushape_ray.pipelines.queries import (q_events_rollup,
                                               sql_events_rollup)

    sf = "/root/testdata/sf0.001"
    key = ["event_type", "day", "n"]
    got = q_events_rollup(sf).to_pandas()
    exp = _duckdb_views(sf).execute(sql_events_rollup()).df()
    g = sorted(map(tuple, got[key].astype(str).itertuples(index=False)))
    e = sorted(map(tuple, exp[key].astype(str).itertuples(index=False)))
    assert g == e
    # structural: exactly one grand total, one subtotal per type
    assert int(got["day"].isna().sum()) == int(got["event_type"].nunique(
        dropna=True)) + 1
    assert int(got["event_type"].isna().sum()) == 1


def test_orders_monthly_growth_matches_oracle(ray_session):
    """LAG over an aggregate: per-month revenue, previous month and the
    delta (including the NULL first row) match DuckDB at sf0.001."""
    from aushape_ray.pipelines.queries import (q_orders_monthly_growth,
                                               sql_orders_monthly_growth)

    sf = "/root/testdata/sf0.001"
    got = q_orders_monthly_growth(sf).to_pandas() \
        .sort_values("month", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_orders_monthly_growth()).df() \
        .sort_values("month", ignore_index=True)
    assert got["month"].tolist() == exp["month"].tolist()
    for c in ("revenue_cents", "prev_cents", "delta_cents"):
        g, e = got[c].astype("Int64"), exp[c].astype("Int64")
        assert ((g.isna() & e.isna()) | (g == e)).all(), c
    # the window is real: exactly one NULL lag row, a multi-month axis
    assert int(got["prev_cents"].isna().sum()) == 1
    assert len(got) > 12


def test_lineitem_small_qty_revenue_matches_oracle(ray_session):
    """TPC-H Q17 shape (join back to own aggregate): the integer-domain
    below-average filter and both totals match DuckDB at sf0.001, and
    the filter is non-trivial in both directions."""
    from aushape_ray.pipelines.queries import (
        q_lineitem_small_qty_revenue, sql_lineitem_small_qty_revenue)

    sf = "/root/testdata/sf0.001"
    got = q_lineitem_small_qty_revenue(sf).to_pandas()
    exp = _duckdb_views(sf).execute(sql_lineitem_small_qty_revenue()).df()
    assert len(got) == 1
    n = int(got["n_qualifying"].iloc[0])
    assert n == int(exp["n_qualifying"].iloc[0])
    assert (int(got["sum_price_cents"].iloc[0])
            == int(exp["sum_price_cents"].iloc[0]))
    total = _duckdb_views(sf).execute(
        "SELECT count(*) FROM lineitem").fetchone()[0]
    assert 0 < n < total


def test_events_running_total_matches_oracle(ray_session):
    """Row-per-event window function SUM OVER (PARTITION BY user ORDER
    BY ts, event_id): every running value matches the SQL window at
    sf0.001, and the totals actually accumulate."""
    from aushape_ray.pipelines.queries import (q_events_running_total,
                                               sql_events_running_total)

    sf = "/root/testdata/sf0.001"
    got = q_events_running_total(sf).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_running_total()).df() \
        .sort_values("event_id", ignore_index=True)
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    assert (got["running_cents"].astype(int).tolist()
            == exp["running_cents"].tolist())
    n_events = _duckdb_views(sf).execute(
        "SELECT count(*) FROM events").fetchone()[0]
    assert len(got) == n_events  # row-per-event output
    assert got["running_cents"].max() > got["running_cents"].min()


def test_events_cooccur_types_matches_oracle(ray_session):
    """Distinct-pair self-join (market basket): per-pair distinct-user
    counts match the SQL self-join at sf0.001; pair orientation is
    canonical (type_a < type_b) and counts are bounded by the user
    universe."""
    from aushape_ray.pipelines.queries import (q_events_cooccur_types,
                                               sql_events_cooccur_types)

    sf = "/root/testdata/sf0.001"
    key = ["type_a", "type_b"]
    got = q_events_cooccur_types(sf).to_pandas() \
        .sort_values(key, ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_cooccur_types()).df() \
        .sort_values(key, ignore_index=True)
    assert got[key].values.tolist() == exp[key].values.tolist()
    assert got["n_users"].astype(int).tolist() == exp["n_users"].tolist()
    assert (got["type_a"] < got["type_b"]).all()
    n_users = _duckdb_views(sf).execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert got["n_users"].max() <= n_users
    assert len(got) >= 3


def test_events_user_churn_matches_oracle(ray_session):
    """Temporal set-difference (daily active/new/churned users): every
    day's three counters match the SQL self-join replica at sf0.001,
    including the trailing churn-only day past the last active day."""
    from aushape_ray.pipelines.queries import (q_events_user_churn,
                                               sql_events_user_churn)

    sf = "/root/testdata/sf0.001"
    got = q_events_user_churn(sf).to_pandas() \
        .sort_values("day", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_user_churn()).df() \
        .sort_values("day", ignore_index=True)
    assert got["day"].tolist() == exp["day"].tolist()
    for c in ("n_active", "n_new", "n_churned"):
        assert got[c].astype(int).tolist() == exp[c].tolist(), c
    # invariants of the definition: day 1 is all-new; every activity run
    # starts new and ends churned, so the totals balance; the final row
    # is the churn-only day after the corpus ends
    assert int(got.loc[0, "n_new"]) == int(got.loc[0, "n_active"])
    assert int(got["n_new"].sum()) == int(got["n_churned"].sum())
    assert int(got.iloc[-1]["n_active"]) == 0
    assert int(got.iloc[-1]["n_churned"]) > 0


def test_events_gap_median_matches_oracle(ray_session):
    """Derived-value order statistic: per-user exact median inter-event
    gap is bit-identical to DuckDB's quantile_cont at sf0.001 (integer
    microsecond gaps make every median .0/.5-representable)."""
    import numpy as np

    from aushape_ray.pipelines.queries import (q_events_gap_median,
                                               sql_events_gap_median)

    sf = "/root/testdata/sf0.001"
    got = q_events_gap_median(sf).to_pandas() \
        .sort_values("user_id", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_gap_median()).df() \
        .sort_values("user_id", ignore_index=True)
    assert got["user_id"].astype(int).tolist() == exp["user_id"].tolist()
    assert got["n_gaps"].astype(int).tolist() == exp["n_gaps"].tolist()
    assert np.array_equal(got["median_gap_us"].to_numpy(np.float64),
                          exp["median_gap_us"].to_numpy(np.float64))
    # every user with >= 2 events appears; a median is a real gap scale
    n_users = _duckdb_views(sf).execute(
        "SELECT count(*) FROM (SELECT user_id FROM events "
        "GROUP BY user_id HAVING count(*) >= 2)").fetchone()[0]
    assert len(got) == n_users
    assert (got["median_gap_us"] > 0).all()


def test_orders_priority_returns_matches_oracle(ray_session):
    """EXISTS semi-join (Q4 shape): per-priority counts of orders with a
    returned lineitem match the SQL EXISTS at sf0.001, and the semi-join
    never multiplies rows (each count is bounded by the order count)."""
    from aushape_ray.pipelines.queries import (q_orders_priority_returns,
                                               sql_orders_priority_returns)

    sf = "/root/testdata/sf0.001"
    got = q_orders_priority_returns(sf).to_pandas() \
        .sort_values("o_orderpriority", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_orders_priority_returns()).df() \
        .sort_values("o_orderpriority", ignore_index=True)
    assert got["o_orderpriority"].tolist() == exp["o_orderpriority"].tolist()
    assert got["n_orders"].astype(int).tolist() == exp["n_orders"].tolist()
    n_orders = _duckdb_views(sf).execute(
        "SELECT count(*) FROM orders").fetchone()[0]
    assert 0 < got["n_orders"].sum() <= n_orders


def test_events_cube_matches_oracle(ray_session):
    """CUBE grouping sets: all four levels (detail, per-type, per-day,
    grand total) match DuckDB's GROUP BY CUBE at sf0.001, and the level
    row counts obey the CUBE arithmetic."""
    from aushape_ray.pipelines.queries import q_events_cube, sql_events_cube

    sf = "/root/testdata/sf0.001"
    key = ["event_type", "day", "n"]
    got = q_events_cube(sf).to_pandas().sort_values(
        key, ignore_index=True, na_position="first")
    exp = _duckdb_views(sf).execute(sql_events_cube()).df().sort_values(
        key, ignore_index=True, na_position="first")
    assert len(got) == len(exp)
    assert got["n"].astype(int).tolist() == exp["n"].tolist()
    assert got["event_type"].fillna("~").tolist() == \
        exp["event_type"].fillna("~").tolist()
    assert got["day"].fillna(pd.Timestamp(0)).tolist() == \
        exp["day"].fillna(pd.Timestamp(0)).tolist()
    # level arithmetic: detail + |types| + |days| + 1
    n_types = got["day"].isna() & got["event_type"].notna()
    n_days = got["event_type"].isna() & got["day"].notna()
    both_null = got["event_type"].isna() & got["day"].isna()
    assert both_null.sum() == 1
    assert len(got) == (len(got) - n_types.sum() - n_days.sum() - 1
                        + n_types.sum() + n_days.sum() + 1)
    # every level sums to the same grand total
    total = int(got.loc[both_null, "n"].iloc[0])
    assert int(got.loc[n_types, "n"].sum()) == total
    assert int(got.loc[n_days, "n"].sum()) == total


def test_events_onboarding_paths_matches_oracle(ray_session):
    """Ordered string aggregation: first-8-event path signatures and
    their user counts match the SQL string_agg(... ORDER BY) replica at
    sf0.001; user totals conserve."""
    from aushape_ray.pipelines.queries import (q_events_onboarding_paths,
                                               sql_events_onboarding_paths)

    sf = "/root/testdata/sf0.001"
    got = q_events_onboarding_paths(sf).to_pandas() \
        .sort_values("path", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_onboarding_paths()).df() \
        .sort_values("path", ignore_index=True)
    assert got["path"].tolist() == exp["path"].tolist()
    assert got["n_users"].astype(int).tolist() == exp["n_users"].tolist()
    n_users = _duckdb_views(sf).execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(got["n_users"].sum()) == n_users
    # paths are at most 8 segments
    assert got["path"].str.count(">").max() <= 7


def test_customer_balance_deciles_matches_oracle(ray_session):
    """Global NTILE(10): per-decile count/min/max/sum match DuckDB's
    ntile window at sf0.001; deciles partition the customer set with the
    standard big-buckets-first split."""
    from aushape_ray.pipelines.queries import (q_customer_balance_deciles,
                                               sql_customer_balance_deciles)

    sf = "/root/testdata/sf0.001"
    got = q_customer_balance_deciles(sf).to_pandas() \
        .sort_values("decile", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_customer_balance_deciles()).df() \
        .sort_values("decile", ignore_index=True)
    for c in ("decile", "n_customers", "min_cents", "max_cents",
              "sum_cents"):
        assert got[c].astype(int).tolist() == exp[c].tolist(), c
    n = _duckdb_views(sf).execute(
        "SELECT count(*) FROM customer").fetchone()[0]
    sizes = got.sort_values("decile")["n_customers"].astype(int).tolist()
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1
    assert sizes == sorted(sizes, reverse=True)  # big buckets first
    # equal-frequency bins are value-ordered
    assert (got.sort_values("decile")["min_cents"].astype(int).diff()
            .dropna() >= 0).all()


def test_customers_idle_rich_matches_oracle(ray_session):
    """Scalar-subquery + predicated anti-join (Q22 shape): per-segment
    counts and cent sums match DuckDB at sf0.001, and the integer
    cross-multiplication threshold keeps boundary handling exact."""
    from aushape_ray.pipelines.queries import (q_customers_idle_rich,
                                               sql_customers_idle_rich)

    sf = "/root/testdata/sf0.001"
    got = q_customers_idle_rich(sf).to_pandas() \
        .sort_values("c_mktsegment", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_customers_idle_rich()).df() \
        .sort_values("c_mktsegment", ignore_index=True)
    assert got["c_mktsegment"].tolist() == exp["c_mktsegment"].tolist()
    assert got["n_customers"].astype(int).tolist() == \
        exp["n_customers"].tolist()
    assert got["sum_cents"].astype(int).tolist() == exp["sum_cents"].tolist()
    assert len(got) >= 1  # the predicate keeps a real population
    # every selected customer is above the positive-balance average
    avg_pos = _duckdb_views(sf).execute(
        "SELECT avg(CAST(floor(c_acctbal*100+0.5) AS BIGINT)) FROM customer "
        "WHERE floor(c_acctbal*100+0.5) > 0").fetchone()[0]
    assert (got["sum_cents"] / got["n_customers"] > avg_pos).all()


def test_global_ntile_small_n_edge_cases(ray_session):
    """NTILE degenerate splits: n < k gives each row its own tile 1..n;
    n == k gives exactly one row per tile; uneven n puts the larger
    buckets first — all matching the standard SQL split."""
    import pyarrow as pa
    import ray

    from aushape_ray.functions.windows import global_ntile

    def tiles_for(n, k):
        ds = ray.data.from_arrow(pa.table({
            "id": pa.array(list(range(n)), pa.int64()),
            "v": pa.array([i * 7 % n for i in range(n)], pa.int64()),
        }))
        out = global_ntile(ds, "v", "id", k=k, n_parts=4).to_pandas()
        out = out.sort_values(["v", "id"], ignore_index=True)
        return out["tile"].astype(int).tolist()

    assert tiles_for(3, 10) == [1, 2, 3]
    assert tiles_for(5, 5) == [1, 2, 3, 4, 5]
    # n=7, k=3: sizes 3,2,2
    assert tiles_for(7, 3) == [1, 1, 1, 2, 2, 3, 3]


def test_emb_dim_minmax_matches_oracle(ray_session):
    """LIST UNNEST aggregation: per-dimension min/max/count match the
    SQL unnest replica at sf0.001 bit-for-bit (min/max are exact float
    selections; float32->float64 widening is exact)."""
    from aushape_ray.pipelines.queries import (q_emb_dim_minmax,
                                               sql_emb_dim_minmax)

    sf = "/root/testdata/sf0.001"
    got = q_emb_dim_minmax(sf).to_pandas().sort_values(
        "dim", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_emb_dim_minmax()).df().sort_values(
        "dim", ignore_index=True)
    assert got["dim"].astype(int).tolist() == exp["dim"].tolist()
    assert np.array_equal(got["vmin"].to_numpy(np.float64),
                          exp["vmin"].to_numpy(np.float64))
    assert np.array_equal(got["vmax"].to_numpy(np.float64),
                          exp["vmax"].to_numpy(np.float64))
    assert got["n"].astype(int).tolist() == exp["n"].tolist()
    assert got["n_pos"].astype(int).tolist() == exp["n_pos"].tolist()
    n_vecs = _duckdb_views(sf).execute(
        "SELECT count(*) FROM embeddings").fetchone()[0]
    assert (got["n"] == n_vecs).all()
    assert (got["vmin"] <= got["vmax"]).all()


def test_events_type_share_matches_oracle(ray_session):
    """Percent-of-total in integer basis points: exact floor division on
    both engines; shares sum to <= 10000 with bounded rounding loss."""
    from aushape_ray.pipelines.queries import (q_events_type_share,
                                               sql_events_type_share)

    sf = "/root/testdata/sf0.001"
    got = q_events_type_share(sf).to_pandas().sort_values(
        "event_type", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_type_share()).df() \
        .sort_values("event_type", ignore_index=True)
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["cents"].astype(int).tolist() == exp["cents"].tolist()
    assert got["share_bp"].astype(int).tolist() == exp["share_bp"].tolist()
    s = int(got["share_bp"].sum())
    assert 10000 - len(got) < s <= 10000  # floor rounding loses < 1bp/type


def test_events_followup_pairs_matches_oracle(ray_session):
    """Temporal band self-join: per-type-pair follower counts within 6 h
    match the SQL band join at sf0.001, including strict b.ts > a.ts on
    duplicate timestamps."""
    from aushape_ray.pipelines.queries import (q_events_followup_pairs,
                                               sql_events_followup_pairs)

    sf = "/root/testdata/sf0.001"
    key = ["type_a", "type_b"]
    got = q_events_followup_pairs(sf).to_pandas() \
        .sort_values(key, ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_followup_pairs()).df() \
        .sort_values(key, ignore_index=True)
    assert got[key].values.tolist() == exp[key].values.tolist()
    assert got["n_pairs"].astype(int).tolist() == exp["n_pairs"].tolist()
    assert int(got["n_pairs"].sum()) > 0


def test_followup_pairs_strictness_and_band_edges(ray_session):
    """Constructed corpus pins the band semantics: equal timestamps never
    pair (strict >), the exact 6 h boundary pairs (<=), one past it does
    not, and users never cross."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_events_followup_pairs

    W = 21_600 * 1_000_000
    base = 1_700_000_000_000_000
    rows = [
        # user 1: tie pair (never counts), boundary pair (counts),
        # past-boundary pair (does not)
        (1, base, "A"), (1, base, "B"),            # tie
        (1, base + W, "C"),                        # exactly 6h after base
        (1, base + 2 * W + 1, "D"),                # past every band
        # user 2: would pair with user 1's events if users leaked
        (2, base + 1, "E"),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = q_events_followup_pairs(d).to_pandas()
    pairs = {(r.type_a, r.type_b): int(r.n_pairs)
             for r in got.itertuples()}
    # A->C and B->C are exactly at the boundary: counted
    assert pairs == {("A", "C"): 1, ("B", "C"): 1}


def test_events_daily_dense_matches_oracle(ray_session):
    """Densification: the zero-filled (day x type) grid matches the SQL
    generate_series replica at sf0.001, covers the full span for every
    type, and contains at least one genuinely zero-filled cell iff the
    SQL does."""
    from aushape_ray.pipelines.queries import (q_events_daily_dense,
                                               sql_events_daily_dense)

    sf = "/root/testdata/sf0.001"
    key = ["event_type", "day"]
    got = q_events_daily_dense(sf).to_pandas().sort_values(
        key, ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_daily_dense()).df() \
        .sort_values(key, ignore_index=True)
    assert got[key].values.tolist() == exp[key].values.tolist()
    assert got["n"].astype(int).tolist() == exp["n"].tolist()
    # perfect grid: every type has the same number of days
    sizes = got.groupby("event_type").size()
    assert sizes.nunique() == 1
    n_days = int(sizes.iloc[0])
    span_days = (got["day"].max() - got["day"].min()).days + 1
    assert n_days == span_days


def test_events_first_touch_matches_oracle(ray_session):
    """First-touch attribution: per-first-type user counts and attributed
    cents match the SQL first_value replica at sf0.001; users and total
    cents conserve across attribution keys."""
    from aushape_ray.pipelines.queries import (q_events_first_touch,
                                               sql_events_first_touch)

    sf = "/root/testdata/sf0.001"
    got = q_events_first_touch(sf).to_pandas().sort_values(
        "first_type", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_first_touch()).df() \
        .sort_values("first_type", ignore_index=True)
    assert got["first_type"].tolist() == exp["first_type"].tolist()
    assert got["n_users"].astype(int).tolist() == exp["n_users"].tolist()
    assert got["total_cents"].astype(int).tolist() == \
        exp["total_cents"].tolist()
    con = _duckdb_views(sf)
    assert int(got["n_users"].sum()) == con.execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(got["total_cents"].sum()) == con.execute(
        "SELECT sum(CAST(floor(value*100+0.5) AS BIGINT)) FROM events"
    ).fetchone()[0]


def test_top_tokens_arrow_partial_matches_findall():
    """The Arrow split-on-[^a-z]+ partial produces the exact re.findall
    token multiset, including nulls, empty strings, unicode, and
    uppercase-only documents."""
    import collections
    import re

    texts = ["Hello World", "", None, "abc  def\tabc", "ÄÖÜ niño déjà",
             "UPPERCASE ONLY", "a", "1a2b3c", "mixedCASEtok"]
    rx = re.compile(r"[a-z]+")
    want = collections.Counter()
    for t in texts:
        want.update(rx.findall(t or ""))

    text = pa.chunked_array([pa.array(texts, pa.string())])
    if text.null_count:
        text = text.fill_null("")
    import pyarrow.compute as pc
    toks = pc.list_flatten(
        pc.split_pattern_regex(text.combine_chunks(), "[^a-z]+"))
    toks = toks.filter(pc.not_equal(toks, ""))
    got = collections.Counter(toks.to_pylist())
    assert got == want


def test_emb_hard_negatives_matches_oracle(ray_session):
    """Hard-negative mining: top-3 different-label neighbors match the
    SQL label-excluded self-join at sf0.001, and no neighbor ever shares
    its node's label."""
    from aushape_ray.pipelines.queries import (q_emb_hard_negatives,
                                               sql_emb_hard_negatives)

    sf = "/root/testdata/sf0.001"
    key = ["node", "rank"]
    got = q_emb_hard_negatives(sf).to_pandas().sort_values(
        key, ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_emb_hard_negatives()).df() \
        .sort_values(key, ignore_index=True)
    assert got[key].values.tolist() == exp[key].values.tolist()
    assert got["neighbor_id"].astype(int).tolist() == \
        exp["neighbor_id"].tolist()
    lab = _duckdb_views(sf).execute(
        "SELECT vec_id, label FROM embeddings").df() \
        .set_index("vec_id")["label"]
    assert (lab.loc[got["node"]].to_numpy()
            != lab.loc[got["neighbor_id"]].to_numpy()).all()


def test_knn_label_exclusion_constructed(ray_session):
    """Constructed corpus pins the masking semantics: a node whose only
    close peers share its label skips them all; a node with fewer than
    k different-label peers emits fewer rows, never a same-label or
    self edge."""
    import ray

    from aushape_ray.functions.ann import knn_graph

    # 2-D unit vectors: ids 0,1,2 at angle ~0 (label 0 for 0,1; label 1
    # for 2), id 3 at angle 90° label 1, id 4 at angle 180° label 0
    import math
    angs = [0.0, 0.02, 0.04, math.pi / 2, math.pi]
    labs = [0, 0, 1, 1, 0]
    t = pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array([[math.cos(a), math.sin(a)] for a in angs],
                              pa.list_(pa.float32())),
        "label": pa.array(labs, pa.int32()),
    })
    out = knn_graph(ray.data.from_arrow(t), k=2, n_blocks=2,
                    label_col="label").to_pandas()
    nbrs = {n: g.sort_values("rank")["neighbor_id"].tolist()
            for n, g in out.groupby("node")}
    # node 0 (label 0): nearest different-label are 2 (0.04 rad) then 3
    assert nbrs[0] == [2, 3]
    # node 2 (label 1): nearest different-label are 1 then 0
    assert nbrs[2] == [1, 0]
    # node 3 (label 1): different-label peers 0,1,4 — nearest two by
    # cosine: 1 (89°-ish) then 0 (90°); 4 is at 90° past it
    assert nbrs[3] == [1, 0]
    # only two label-1 vectors exist, so label-0 nodes always find 2
    # negatives; every emitted edge crosses labels
    lab = dict(zip(range(5), labs))
    assert all(lab[r.node] != lab[r.neighbor_id]
               for r in out.itertuples())


def test_followup_pairs_hot_user_counting_form(ray_session):
    """A user with n=5000 events inside one band is C(n,2) ~ 12.5M pairs
    — the counting form never materializes them (O(n log n) per type)
    and the count matches the closed form."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_events_followup_pairs

    n = 5000
    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([base + i for i in range(n)], pa.timestamp("us")),
        "user_id": pa.array([7] * n, pa.int64()),
        "event_type": pa.array(["X"] * n, pa.string()),
        "value": pa.array([1.0] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        got = q_events_followup_pairs(d).to_pandas()
    assert len(got) == 1
    assert (got.iloc[0]["type_a"], got.iloc[0]["type_b"]) == ("X", "X")
    assert int(got.iloc[0]["n_pairs"]) == n * (n - 1) // 2


def test_events_moving_sum_matches_oracle(ray_session):
    """Bounded ROWS frame: 5-row moving cents sums match the SQL frame
    at sf0.001; the first rows of each user partial-frame correctly."""
    from aushape_ray.pipelines.queries import (q_events_moving_sum,
                                               sql_events_moving_sum)

    sf = "/root/testdata/sf0.001"
    got = q_events_moving_sum(sf).to_pandas().sort_values(
        "event_id", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_moving_sum()).df() \
        .sort_values("event_id", ignore_index=True)
    assert got["event_id"].astype(int).tolist() == exp["event_id"].tolist()
    assert got["moving_cents"].astype(int).tolist() == \
        exp["moving_cents"].tolist()
    n = _duckdb_views(sf).execute(
        "SELECT count(*) FROM events").fetchone()[0]
    assert len(got) == n


def test_moving_sum_frame_edges(ray_session):
    """Constructed corpus pins the frame semantics: partial frames at
    the head of each user, full frames after, user boundaries never
    leak."""
    import os
    import tempfile

    import pyarrow.parquet as pq
    import ray  # noqa: F401

    from aushape_ray.functions.windows import moving_sum

    # user 1: cents 100,200,300,400,500,600 -> frames of 5
    # user 2: single event
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 9.0]
    uids = [1, 1, 1, 1, 1, 1, 2]
    base = 1_700_000_000_000_000
    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "ts": pa.array([base + i for i in range(7)], pa.timestamp("us")),
        "user_id": pa.array(uids, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    })
    import ray.data
    out = moving_sum(ray.data.from_arrow(t), frame=5).to_pandas() \
        .sort_values("event_id", ignore_index=True)
    assert out["moving_cents"].tolist() == [
        100, 300, 600, 1000, 1500,      # partial then full frames
        2000,                           # 200+300+400+500+600
        900,                            # user 2 frame never sees user 1
    ]


def test_events_audience_overlap_matches_oracle(ray_session):
    """INTERSECT/EXCEPT set ops: the three audience segments match the
    SQL set algebra at sf0.001 and partition the active-in-either-week
    user set."""
    from aushape_ray.pipelines.queries import (q_events_audience_overlap,
                                               sql_events_audience_overlap)

    sf = "/root/testdata/sf0.001"
    got = q_events_audience_overlap(sf).to_pandas().sort_values(
        "segment", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_audience_overlap()).df() \
        .sort_values("segment", ignore_index=True)
    assert got["segment"].tolist() == exp["segment"].tolist()
    assert got["n_users"].astype(int).tolist() == exp["n_users"].tolist()
    union = _duckdb_views(sf).execute("""
WITH b AS (SELECT epoch_us(ts) // 86400000000 AS d, user_id FROM events),
lim AS (SELECT min(d) AS d0, max(d) AS d1 FROM b)
SELECT count(DISTINCT user_id) FROM b, lim
WHERE d < d0 + 7 OR d > d1 - 7""").fetchone()[0]
    assert int(got["n_users"].sum()) == union


def test_events_user_streaks_matches_oracle(ray_session):
    """Gaps-and-islands: the longest-streak histogram matches the SQL
    day - row_number() islands at sf0.001, and user totals conserve."""
    from aushape_ray.pipelines.queries import (q_events_user_streaks,
                                               sql_events_user_streaks)

    sf = "/root/testdata/sf0.001"
    got = q_events_user_streaks(sf).to_pandas().sort_values(
        "streak_days", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_user_streaks()).df() \
        .sort_values("streak_days", ignore_index=True)
    assert got["streak_days"].astype(int).tolist() == \
        exp["streak_days"].tolist()
    assert got["n_users"].astype(int).tolist() == exp["n_users"].tolist()
    n_users = _duckdb_views(sf).execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(got["n_users"].sum()) == n_users


def test_user_day_streaks_islands(ray_session):
    """Constructed corpus pins island semantics: duplicate days inside a
    run collapse, gaps split runs, users never merge."""
    import ray.data

    from aushape_ray.functions.windows import user_day_streaks

    US_DAY = 86_400_000_000
    # user 1: days 0,1,2 then 5,6 (best 3); user 2: days 0,0,0 (best 1);
    # user 3: days 10,12,14 (best 1)
    days = [0, 1, 2, 5, 6, 0, 0, 0, 10, 12, 14]
    uids = [1, 1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    t = pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array([d * US_DAY + 7 for d in days], pa.timestamp("us")),
    })
    out = user_day_streaks(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("streak_days", ignore_index=True)
    assert out["streak_days"].astype(int).tolist() == [1, 3]
    assert out["n_users"].astype(int).tolist() == [2, 1]


def test_events_range_sum_matches_oracle(ray_session):
    """RANGE interval frame: trailing-hour per-user cents sums match the
    SQL RANGE frame (peer-inclusive) at sf0.001, row-per-event."""
    from aushape_ray.pipelines.queries import (q_events_range_sum,
                                               sql_events_range_sum)

    sf = "/root/testdata/sf0.001"
    got = q_events_range_sum(sf).to_pandas().sort_values(
        "event_id", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_range_sum()).df() \
        .sort_values("event_id", ignore_index=True)
    assert got["event_id"].astype(int).tolist() == exp["event_id"].tolist()
    assert got["range_cents"].astype(int).tolist() == \
        exp["range_cents"].tolist()


def test_range_interval_sum_edges(ray_session):
    """Constructed corpus pins RANGE semantics: exact-boundary rows stay
    in frame, same-ts peers sum together (even 'later' peers), user
    boundaries never leak, fallback loop path agrees."""
    import ray.data

    from aushape_ray.functions.windows import range_interval_sum

    base = 1_700_000_000_000_000
    H = 3_600_000_000
    # user 1: t=0 (100), t=H (200; boundary -> includes t=0),
    #         t=H (300; peer of previous), t=2H+1 (400; 0 falls out,
    #         H rows stay: |2H+1 - H| = H+1 > H -> actually out)
    # user 2: t=0 (900) — never sees user 1
    t = pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "ts": pa.array([base, base + H, base + H, base + 2 * H + 1,
                        base], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 9.0], pa.float64()),
    })
    out = range_interval_sum(
        ray.data.from_arrow(t), gap_s=3600).to_pandas().sort_values(
        "event_id", ignore_index=True)
    # frames: e0=[0]; e1,e2=[0,H,H] (boundary in, peers sum);
    # e3=[2H+1-H, 2H+1] = (H+1, ...] -> excludes both H rows? no:
    # H >= 2H+1-H = H+1 is false -> only itself
    assert out["range_cents"].tolist() == [100, 600, 600, 400, 900]


def test_events_mode_type_matches_oracle(ray_session):
    """Grouped mode: per-user dominant event type histogram matches the
    SQL row_number argmax (ties -> smallest type) at sf0.001."""
    from aushape_ray.pipelines.queries import (q_events_mode_type,
                                               sql_events_mode_type)

    sf = "/root/testdata/sf0.001"
    got = q_events_mode_type(sf).to_pandas().sort_values(
        "event_type", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_mode_type()).df() \
        .sort_values("event_type", ignore_index=True)
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n_users"].astype(int).tolist() == exp["n_users"].tolist()
    n_users = _duckdb_views(sf).execute(
        "SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert int(got["n_users"].sum()) == n_users


def test_users_customers_reconcile_matches_oracle(ray_session):
    """FULL OUTER JOIN reconciliation matches the SQL at sf0.001:
    segments partition the id universe; one-sided rows carry nulls."""
    from aushape_ray.pipelines.queries import (
        q_users_customers_reconcile, sql_users_customers_reconcile)

    sf = "/root/testdata/sf0.001"
    got = q_users_customers_reconcile(sf).to_pandas().sort_values(
        "id", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_users_customers_reconcile()).df() \
        .sort_values("id", ignore_index=True)
    assert got["id"].astype(int).tolist() == exp["id"].tolist()
    assert got["segment"].tolist() == exp["segment"].tolist()
    assert got["n_events"].astype(int).tolist() == exp["n_events"].tolist()
    ga = got["acct_cents"].astype("Int64").tolist()
    ea = exp["acct_cents"].astype("Int64").tolist()
    assert ga == ea
    # null contract: acct_cents null iff events_only
    nulls = got["acct_cents"].isna()
    assert (got.loc[nulls, "segment"] == "events_only").all()
    assert not got.loc[~nulls, "segment"].eq("events_only").any()


def test_events_type_moments_matches_oracle(ray_session):
    """Mergeable sufficient statistics: the six integer moments match
    SQL exactly at sf0.001 and reconstruct the same Pearson r."""
    from aushape_ray.pipelines.queries import (q_events_type_moments,
                                               sql_events_type_moments)

    sf = "/root/testdata/sf0.001"
    got = q_events_type_moments(sf).to_pandas().sort_values(
        "event_type", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_type_moments()).df() \
        .sort_values("event_type", ignore_index=True)
    for c in ["event_type", "n", "sum_x", "sum_xx", "sum_y", "sum_yy",
              "sum_xy"]:
        assert got[c].tolist() == exp[c].tolist(), c
    # the moments finish covariance on the driver with no further pass
    r0 = got.iloc[0]
    n = r0["n"]
    cov_num = n * r0["sum_xy"] - r0["sum_x"] * r0["sum_y"]
    assert isinstance(int(cov_num), int)


def test_events_top_types_ranked_matches_oracle(ray_session):
    """RANK with ties: ranked-1-2 types per day match SQL rank()
    semantics at sf0.001 (ties share a rank and all survive)."""
    from aushape_ray.pipelines.queries import (
        q_events_top_types_ranked, sql_events_top_types_ranked)

    sf = "/root/testdata/sf0.001"
    got = q_events_top_types_ranked(sf)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    got = got.sort_values(["day", "event_type"], ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_top_types_ranked()).df() \
        .sort_values(["day", "event_type"], ignore_index=True)
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n"].astype(int).tolist() == exp["n"].tolist()
    assert got["rnk"].astype(int).tolist() == exp["rnk"].tolist()


def test_rank_ties_semantics(ray_session):
    """Constructed tie corpus: two types tied at rank 1 both survive and
    the next rank is 3 (competition ranking), so only the tied pair
    returns for that day."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_events_top_types_ranked

    US_DAY = 86_400_000_000
    rows = (["a"] * 3 + ["b"] * 3 + ["c"] * 2 +   # day 0: a,b tie at 3
            ["a"] * 2 + ["b"] * 1)                # day 1: a=2, b=1
    days = [0] * 8 + [1] * 3
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([d * US_DAY + i for i, d in enumerate(days)],
                       pa.timestamp("us")),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array(rows, pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "events.parquet"))
        out = q_events_top_types_ranked(d)
        df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    df = df.sort_values(["day", "event_type"], ignore_index=True)
    day0 = df[df["day"] == df["day"].min()]
    assert day0["event_type"].tolist() == ["a", "b"]   # c (rank 3) out
    assert day0["rnk"].astype(int).tolist() == [1, 1]
    day1 = df[df["day"] == df["day"].max()]
    assert day1["event_type"].tolist() == ["a", "b"]
    assert day1["rnk"].astype(int).tolist() == [1, 2]


def test_doc_vocab_growth_matches_oracle(ray_session):
    """Heaps'-law curve: per-decile new-token counts match the SQL
    min-doc attribution at sf0.001."""
    from aushape_ray.pipelines.queries import (q_doc_vocab_growth,
                                               sql_doc_vocab_growth)

    sf = "/root/testdata/sf0.001"
    got = q_doc_vocab_growth(sf).to_pandas().sort_values(
        "decile", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_doc_vocab_growth()).df() \
        .sort_values("decile", ignore_index=True)
    assert got["decile"].astype(int).tolist() == exp["decile"].tolist()
    assert got["n_new_tokens"].astype(int).tolist() == \
        exp["n_new_tokens"].tolist()


def test_doc_vocab_growth_multi_decile(ray_session):
    """Constructed corpus spreads first occurrences across deciles:
    min-doc attribution (not count) drives the histogram; repeated
    tokens never count twice."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    from aushape_ray.pipelines.queries import q_doc_vocab_growth

    # 10 docs (deciles == doc_id): "alpha" everywhere (counts once, in
    # decile 0), "beta" first at doc 5, "gamma" only at doc 9
    texts = []
    for i in range(10):
        t = "alpha"
        if i >= 5:
            t += " beta"
        if i == 9:
            t += " gamma"
        texts.append(t)
    t = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["s"] * 10),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        out = q_doc_vocab_growth(d).to_pandas().sort_values(
            "decile", ignore_index=True)
    assert out["decile"].astype(int).tolist() == [0, 5, 9]
    assert out["n_new_tokens"].astype(int).tolist() == [1, 1, 1]


def test_events_unpivot_daily_matches_oracle(ray_session):
    """UNPIVOT: the melted long table matches SQL UNPIVOT over the same
    dynamic PIVOT at sf0.001, zero cells included, and round-trips the
    pivot's cell count (days x types)."""
    from aushape_ray.pipelines.queries import (q_events_unpivot_daily,
                                               sql_events_unpivot_daily)

    sf = "/root/testdata/sf0.001"
    got = q_events_unpivot_daily(sf).to_pandas().sort_values(
        ["day", "event_type"], ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_unpivot_daily()).df() \
        .sort_values(["day", "event_type"], ignore_index=True)
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["n"].astype(int).tolist() == exp["n"].tolist()
    n_days = got["day"].nunique()
    n_types = got["event_type"].nunique()
    assert len(got) == n_days * n_types  # dense long grid, 0-cells kept


def test_orders_customer_share_matches_oracle(ray_session):
    """Per-row percent-of-group: basis points match the SQL partitioned
    ratio_to_report at sf0.001 and sum to ~10000 per customer."""
    from aushape_ray.pipelines.queries import (q_orders_customer_share,
                                               sql_orders_customer_share)

    sf = "/root/testdata/sf0.001"
    got = q_orders_customer_share(sf).to_pandas().sort_values(
        "o_orderkey", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_orders_customer_share()).df() \
        .sort_values("o_orderkey", ignore_index=True)
    assert got["o_orderkey"].astype(int).tolist() == \
        exp["o_orderkey"].tolist()
    assert got["share_bp"].astype(int).tolist() == \
        exp["share_bp"].tolist()
    # single-order customers read exactly 10000 bp
    orders = _duckdb_views(sf).execute(
        "SELECT o_orderkey FROM orders QUALIFY count(*) OVER "
        "(PARTITION BY o_custkey) = 1").df()["o_orderkey"]
    solo = got[got["o_orderkey"].isin(set(orders))]
    assert (solo["share_bp"] == 10000).all()


def test_doc_dup_triangles_matches_oracle(ray_session):
    """Graph analytics: triangle/wedge/edge counts over the verified
    near-dup graph match the SQL 3-way self-join at sf0.001."""
    from aushape_ray.pipelines.queries import (q_doc_dup_triangles,
                                               sql_doc_dup_triangles)

    sf = "/root/testdata/sf0.001"
    got = q_doc_dup_triangles(sf)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    exp = _duckdb_views(sf).execute(sql_doc_dup_triangles()).df()
    for c in ["n_edges", "n_wedges", "n_triangles"]:
        assert int(got[c].iloc[0]) == int(exp[c].iloc[0]), c


def test_triangle_stats_constructed(ray_session):
    """Forward-algorithm unit semantics on a constructed graph:
    K4 (4 triangles), a 3-path (0 triangles, 2 wedges), an isolated
    edge; counts verified against brute force."""
    from itertools import combinations

    import ray.data

    from aushape_ray.functions.graph import triangle_stats

    # K4 on {0..3}; path 10-11-12-13; edge 20-21
    edges = list(combinations(range(4), 2)) + \
        [(10, 11), (11, 12), (12, 13), (20, 21)]
    t = pa.table({
        "doc_a": pa.array([a for a, b in edges], pa.int64()),
        "doc_b": pa.array([b for a, b in edges], pa.int64()),
    })
    out = triangle_stats(ray.data.from_arrow(t), n_parts=4)
    assert out.column("n_edges")[0].as_py() == len(edges)
    # wedges: K4 nodes deg 3 -> 4*C(3,2)=12; path degs 1,2,2,1 -> 2;
    # edge degs 1,1 -> 0
    assert out.column("n_wedges")[0].as_py() == 14
    assert out.column("n_triangles")[0].as_py() == 4

    # brute-force cross-check on the same edge set
    es = set(map(tuple, edges))
    nodes = sorted({n for e in edges for n in e})
    brute = sum(1 for a, b, c in combinations(nodes, 3)
                if (a, b) in es and (b, c) in es and (a, c) in es)
    assert out.column("n_triangles")[0].as_py() == brute


def test_doc_dup_rate_by_source_matches_oracle(ray_session):
    """Dedup report: per-source dup participation counts match the SQL
    left-join rate at sf0.001; totals conserve the corpus size."""
    from aushape_ray.pipelines.queries import (
        q_doc_dup_rate_by_source, sql_doc_dup_rate_by_source)

    sf = "/root/testdata/sf0.001"
    got = q_doc_dup_rate_by_source(sf).to_pandas().sort_values(
        "source", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_doc_dup_rate_by_source()).df() \
        .sort_values("source", ignore_index=True)
    assert got["source"].tolist() == exp["source"].tolist()
    assert got["n_docs"].astype(int).tolist() == exp["n_docs"].tolist()
    assert got["n_dup_docs"].astype(int).tolist() == \
        exp["n_dup_docs"].tolist()
    n_total = _duckdb_views(sf).execute(
        "SELECT count(*) FROM documents").fetchone()[0]
    assert int(got["n_docs"].sum()) == n_total
    assert (got["n_dup_docs"] <= got["n_docs"]).all()


def test_events_type_mad_matches_oracle(ray_session):
    """Nested order statistic: per-type median + MAD (integer cents,
    lower-median rank) match the SQL replica at sf0.001."""
    from aushape_ray.pipelines.queries import (q_events_type_mad,
                                               sql_events_type_mad)

    sf = "/root/testdata/sf0.001"
    got = q_events_type_mad(sf)
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    got = got.sort_values("event_type", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_events_type_mad()).df() \
        .sort_values("event_type", ignore_index=True)
    assert got["event_type"].tolist() == exp["event_type"].tolist()
    assert got["med_cents"].astype(int).tolist() == \
        exp["med_cents"].tolist()
    assert got["mad_cents"].astype(int).tolist() == \
        exp["mad_cents"].tolist()


def test_grouped_median_int_edges(ray_session):
    """_grouped_median_int pins the rank convention: even counts take
    the LOWER median; single-value and duplicate-heavy groups exact."""
    import ray.data

    from aushape_ray.pipelines.queries import _grouped_median_int

    t = pa.table({
        "event_type": pa.array(
            ["a"] * 4 + ["b"] * 1 + ["c"] * 5, pa.string()),
        # a: 1,2,3,4 -> lower median 2; b: 7 -> 7; c: 5,5,5,9,9 -> 5
        "cents": pa.array([1, 2, 3, 4, 7, 5, 5, 5, 9, 9], pa.int64()),
    })
    med = _grouped_median_int(ray.data.from_arrow(t), ["a", "b", "c"])
    assert med == {"a": 2, "b": 7, "c": 5}


def test_doc_dup_cluster_sizes_matches_oracle(ray_session):
    """Cluster-size histogram matches the recursive-closure SQL at
    sf0.001 and conserves the clustered-doc total."""
    from aushape_ray.pipelines.queries import (
        q_doc_dup_cluster_sizes, sql_doc_dup_cluster_sizes)

    sf = "/root/testdata/sf0.001"
    got = q_doc_dup_cluster_sizes(sf).to_pandas().sort_values(
        "cluster_size", ignore_index=True)
    exp = _duckdb_views(sf).execute(sql_doc_dup_cluster_sizes()).df() \
        .sort_values("cluster_size", ignore_index=True)
    assert got["cluster_size"].astype(int).tolist() == \
        exp["cluster_size"].tolist()
    assert got["n_clusters"].astype(int).tolist() == \
        exp["n_clusters"].tolist()
    n_clustered = _duckdb_views(sf).execute(
        f"WITH c AS ({__import__('aushape_ray.pipelines.queries', fromlist=['sql_doc_dup_clusters']).sql_doc_dup_clusters()}) SELECT count(*) FROM c").fetchone()[0]
    assert int((got["cluster_size"] * got["n_clusters"]).sum()) == \
        n_clustered
