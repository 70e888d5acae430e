"""Resumable training-shard preparation — the tokens-side flagship.

Takes a (curated) document corpus to the layout a trainer streams:
tokenize (learned BPE) -> deterministic global shuffle into shards ->
next-fit pack into fixed-capacity contexts -> one parquet directory per
shard.  Every leg reuses an operator with its own parity test
(functions/bpe.bpe_train + bpe_encode_counts, the doc_shuffle_shard hash
scheme, functions/packing.next_fit_pack); this module owns orchestration:
checkpoints, per-shard resume, conservation accounting.

Checkpoint/resume design complements curation.py's: curation stages are
GLOBAL so its resumable unit is the stage; shard materialization is
PER-SHARD INDEPENDENT work, so the unit here is the shard — exactly the
north-rule "skip finished partitions" posture.  The tokenize stage (one
global pass) checkpoints per-doc (doc_id, n_tokens, token_checksum) rows
under out_dir/_tokens/ with an input-fingerprint manifest; each shard
task then writes its pack index atomically (tmp + rename) plus a
per-shard manifest, and a resumed run recomputes ONLY shards whose
manifest is missing or stale.  A changed input invalidates everything
automatically via the fingerprint.

Conservation invariant (checked, recorded in the final manifest): the
sum of per-pack token counts over all shards equals the tokenize stage's
total — no doc lost or duplicated by the exchange, shuffle or packer.

On a multi-node cluster out_dir must be shared storage (object store /
NFS); shard tasks write their own partition directly, the driver only
collects per-shard summaries.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

# doc_shuffle_shard's decorrelated multiplicative hashes (queries.py) —
# shard choice and within-shard order must come from independent hashes
_K1, _K2, _M = 2654435761, 2246822519, 1 << 32


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.abspath(path), "size": st.st_size,
            "mtime_ns": st.st_mtime_ns}


def _manifest(path: str) -> "dict | None":
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _write_json(path: str, obj: dict) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def _tokenize_stage(src: str, out_dir: str, fp: dict, resume: bool,
                    num_merges: int) -> "tuple[str, bool]":
    """Global pass: BPE train + corpus encode -> per-doc token counts
    checkpointed as parquet.  Returns (tokens_dir, resumed)."""
    from ..functions.bpe import bpe_encode_counts, bpe_train

    tok_dir = os.path.join(out_dir, "_tokens")
    man_path = os.path.join(out_dir, "_manifests", "tokens.json")
    man = _manifest(man_path)
    # resume validity = same input AND same tokenizer config: a changed
    # num_merges changes every token count, so reusing the checkpoint
    # would be silently wrong
    if (resume and man and man.get("input") == fp
            and man.get("num_merges") == num_merges):
        return tok_dir, True
    t0 = time.time()
    docs = ray.data.read_parquet(src, columns=["doc_id", "text"],
                                 override_num_blocks=32)
    merges = bpe_train(docs, num_merges=num_merges)
    counts = bpe_encode_counts(docs, merges).map_batches(
        lambda t: t.select(["doc_id", "n_tokens", "token_checksum"]),
        batch_format="pyarrow")
    tmp = tok_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(tok_dir, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    counts.write_parquet(tmp)
    os.replace(tmp, tok_dir)
    total = ray.data.read_parquet(tok_dir).sum("n_tokens") or 0
    _write_json(man_path, {
        "stage": "tokens", "input": fp, "num_merges": num_merges,
        "total_tokens": int(total), "sec": round(time.time() - t0, 3)})
    return tok_dir, False


def _shard_manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, "_manifests", f"shard_{shard}.json")


def _materialize_shard(table: pa.Table, out_dir: str, fp: dict,
                       capacity: int, n_shards: int,
                       num_merges: int) -> dict:
    """One shard's reduce task: order by shuffle rank, next-fit pack,
    write the pack index atomically, record the per-shard manifest.
    Runs remotely inside the bucket exchange; the returned summary row
    is the only thing that travels back."""
    from ..functions.packing import pack_summary

    shard = int(table.column("shard")[0].as_py()) if table.num_rows else -1
    ids = table.column("doc_id").to_numpy(zero_copy_only=False)
    h2 = table.column("h2").to_numpy(zero_copy_only=False)
    toks = table.column("n_tokens").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h2))  # rank order: (h2, doc_id)
    cols = pack_summary(ids[order], toks[order], capacity)
    n_packs = len(cols["pack_id"])
    idx = pa.table({
        "pack_id": pa.array(cols["pack_id"], pa.int64()),
        "n_docs": pa.array(cols["n_docs"], pa.int64()),
        "n_tokens": pa.array(cols["n_tokens"], pa.int64()),
        "first_doc_id": pa.array(cols["first_doc_id"], pa.int64()),
    })
    sdir = os.path.join(out_dir, "shards", f"shard={shard}")
    tmp = sdir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(sdir, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(idx, os.path.join(tmp, "packs.parquet"))
    os.replace(tmp, sdir)
    summary = {"shard": shard, "n_docs": int(len(ids)),
               "n_tokens": int(toks.sum()), "n_packs": int(n_packs)}
    # n_shards is part of shard identity (it changes every shard's doc
    # membership) and num_merges is part of the counts' identity — a
    # manifest from a run with different values must never mark this
    # shard done
    _write_json(_shard_manifest_path(out_dir, shard),
                {"stage": "shard", "input": fp, "capacity": capacity,
                 "n_shards": n_shards, "num_merges": num_merges,
                 **summary})
    return summary


def prepare_shards(sf_dir: str, out_dir: str, resume: bool = False,
                   n_shards: int = 8, capacity: int = 256,
                   num_merges: int = 16, strict: bool = True) -> dict:
    """Run (or resume) document corpus -> packed training shards.

    Returns {"shards": [per-shard summaries], "total_tokens": n,
    "resumed_tokens": bool, "resumed_shards": [ids], "conserved": bool}.
    Layout:
      out_dir/_tokens/*.parquet          per-doc (doc_id, n_tokens, cksum)
      out_dir/shards/shard=K/packs.parquet  per-shard pack index
      out_dir/_manifests/{tokens,shard_K}.json
    """
    src = os.path.join(sf_dir, "documents.parquet")
    fp = _fingerprint(src)

    tok_dir, resumed_tokens = _tokenize_stage(src, out_dir, fp, resume,
                                              num_merges)
    tok_man = _manifest(os.path.join(out_dir, "_manifests", "tokens.json"))
    total_tokens = int(tok_man["total_tokens"])

    # per-shard resume: a shard is done iff its manifest matches the input
    done: dict[int, dict] = {}
    if resume:
        for s in range(n_shards):
            man = _manifest(_shard_manifest_path(out_dir, s))
            if (man and man.get("input") == fp
                    and man.get("capacity") == capacity
                    and man.get("n_shards") == n_shards
                    and man.get("num_merges") == num_merges
                    and os.path.isdir(os.path.join(out_dir, "shards",
                                                   f"shard={s}"))):
                done[s] = {k: man[k] for k in
                           ("shard", "n_docs", "n_tokens", "n_packs")}
    todo = [s for s in range(n_shards) if s not in done]

    summaries = list(done.values())
    if todo:
        counts = ray.data.read_parquet(tok_dir,
                                       columns=["doc_id", "n_tokens"],
                                       override_num_blocks=32)
        todo_set = set(todo)

        def assign(b: pa.Table) -> pa.Table:
            did = b.column("doc_id").to_numpy(
                zero_copy_only=False).astype(np.int64)
            r = (did % _M).astype(np.uint64)
            shard = ((r * np.uint64(_K1)) % np.uint64(_M)
                     % np.uint64(n_shards)).astype(np.int64)
            h2 = ((r * np.uint64(_K2)) % np.uint64(_M)).astype(np.int64)
            t = pa.table({
                "doc_id": pa.array(did, pa.int64()),
                "n_tokens": b.column("n_tokens").cast(pa.int64()),
                "shard": pa.array(shard, pa.int64()),
                "h2": pa.array(h2, pa.int64()),
            })
            # prune finished shards BEFORE the exchange: a resumed run
            # only moves the rows of shards it will actually rebuild
            keep = np.isin(shard, list(todo_set))
            return t.filter(pa.array(keep))

        from ..functions.joins import bucket_exchange

        # bucket ids must be 0..n_buckets-1: remap todo shards densely
        remap = {s: i for i, s in enumerate(todo)}

        def add_bucket(t: pa.Table) -> pa.Table:
            sh = t.column("shard").to_numpy(zero_copy_only=False)
            b = np.array([remap[int(x)] for x in sh], np.int64) if len(sh) \
                else np.empty(0, np.int64)
            return t.append_column("__bucket", pa.array(b, pa.int64()))

        def reduce_shard(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"shard": pa.array([], pa.int64()),
                                 "n_docs": pa.array([], pa.int64()),
                                 "n_tokens": pa.array([], pa.int64()),
                                 "n_packs": pa.array([], pa.int64())})
            s = _materialize_shard(t.combine_chunks(), out_dir, fp,
                                   capacity, n_shards, num_merges)
            return pa.table({k: pa.array([v], pa.int64())
                             for k, v in s.items()})

        out = bucket_exchange(
            counts.map_batches(assign, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow"),
            len(todo), reduce_shard)
        summaries.extend(out.take_all())

    summaries.sort(key=lambda s: s["shard"])
    packed_total = sum(s["n_tokens"] for s in summaries)
    conserved = packed_total == total_tokens
    _write_json(os.path.join(out_dir, "_manifests", "final.json"), {
        "stage": "final", "input": fp, "n_shards": n_shards,
        "capacity": capacity, "total_tokens": total_tokens,
        "packed_tokens": packed_total, "conserved": conserved})
    if strict and not conserved:
        # a broken conservation invariant means docs were lost or
        # duplicated by the exchange/packer — corrupt training data; the
        # final manifest above records the evidence, then we refuse
        raise RuntimeError(
            f"prepare_shards: token conservation violated "
            f"(tokenized {total_tokens}, packed {packed_total}); "
            f"out_dir={out_dir} — rerun without resume to rebuild")
    return {"shards": summaries, "total_tokens": total_tokens,
            "resumed_tokens": resumed_tokens,
            "resumed_shards": sorted(done), "conserved": conserved}
