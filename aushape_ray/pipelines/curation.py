"""Resumable end-to-end corpus curation — the documents-side flagship.

Composes the audited operators into the filtering chain a pre-training
corpus runs (C4/CCNet shape): quality+language gate -> exact dedup ->
benchmark decontamination -> near-duplicate dedup -> PII redaction ->
partitioned parquet write.  Every leg reuses an operator that already has
its own oracle/test (quality_score, LangId, exact_dedup_keep_first,
decontaminate_bloom, minhash_candidates -> verify_pairs_jaccard ->
cluster_pairs, redact_pii); this module owns only the orchestration:
precedence, survivor anti-joins, checkpoints, lineage.

Checkpoint/resume design: the events pipeline resumes per input SHARD
(state/manifest.py) because its work is shard-local.  Curation stages are
GLOBAL (dedup compares every doc with every doc), so the resumable unit
here is the STAGE: each stage writes its reject list (doc_id, route) as
parquet under out_dir/_rejects/<stage>/ plus a manifest recording the
input fingerprint, counts and timing.  A resumed run re-reads the reject
parquet of every stage whose manifest still matches the input fingerprint
and recomputes only the rest — so a job killed between stages loses at
most one stage of work, and a changed input invalidates everything
automatically.  Rejects carry only (doc_id, route) — 16-byte rows, never
text — so checkpoints stay tiny even when half the corpus is rejected.

Precedence (first matching route wins; later stages see only survivors):
low_quality -> exact_dup -> contaminated -> near_dup.  Cheap stages run
first so the expensive near-dup chain sees the smallest corpus.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

ROUTES = ("low_quality", "exact_dup", "contaminated", "near_dup")


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": path, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def _stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_rejects", stage)


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{stage}.json")


def _load_manifest(out_dir: str, stage: str) -> "dict | None":
    try:
        with open(_manifest_path(out_dir, stage)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def _write_manifest(out_dir: str, stage: str, man: dict) -> None:
    mp = _manifest_path(out_dir, stage)
    os.makedirs(os.path.dirname(mp), exist_ok=True)
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, mp)


def _checkpoint_rejects(ds: "ray.data.Dataset", out_dir: str,
                        stage: str) -> "ray.data.Dataset":
    """Write a stage's reject list atomically (tmp dir + rename) and
    return a Dataset re-reading the parquet — downstream stages consume
    the CHECKPOINT, not the live lineage, so a resumed run and a fresh
    run execute identical plans."""
    final = _stage_dir(out_dir, stage)
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    os.replace(tmp, final)
    return ray.data.read_parquet(final)


def _empty_rejects() -> pa.Table:
    return pa.table({"doc_id": pa.array([], pa.int64()),
                     "route": pa.array([], pa.string())})


def _survivors(docs: "ray.data.Dataset",
               rejects: "list[ray.data.Dataset]") -> "ray.data.Dataset":
    """Anti-join docs against the union of reject lists (partitioned
    hash join — scale-safe when rejects are corpus-sized)."""
    from ..functions.joins import hash_join

    if not rejects:
        return docs
    rej = rejects[0]
    for r in rejects[1:]:
        rej = rej.union(r)
    rid = rej.map_batches(
        lambda t: pa.table({"rid": t.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow")
    j = hash_join(docs, rid, "doc_id", "rid", how="left")
    return j.map_batches(
        lambda t: t.filter(pc.is_null(t.column("rid"))).drop_columns(["rid"]),
        batch_format="pyarrow")


def curate_corpus(sf_dir: str, out_dir: str, resume: bool = False,
                  quality_min: int = 70, lang: str = "en",
                  jaccard_min: float = 0.5) -> dict:
    """Run (or resume) the curation chain over <sf_dir>/documents.parquet.

    Returns {"routes": {route: n}, "kept": n, "resumed_stages": [...]}.
    Output layout:
      out_dir/kept/*.parquet            redacted surviving docs
      out_dir/_rejects/<stage>/*.parquet   (doc_id, route) lineage
      out_dir/_manifests/<stage>.json      fingerprint + counts + sec
    """
    src = os.path.join(sf_dir, "documents.parquet")
    fp = _fingerprint(src)
    docs = ray.data.read_parquet(src, columns=["doc_id", "text"],
                                 override_num_blocks=32)
    resumed: list[str] = []
    reject_ds: list[ray.data.Dataset] = []
    route_counts: dict[str, int] = {}

    def run_stage(stage: str, compute) -> "ray.data.Dataset":
        man = _load_manifest(out_dir, stage)
        if resume and man and man.get("input") == fp:
            resumed.append(stage)
            route_counts[stage] = man["n_rejects"]
            return ray.data.read_parquet(_stage_dir(out_dir, stage))
        t0 = time.time()
        ds = _checkpoint_rejects(compute(), out_dir, stage)
        n = ds.count()
        route_counts[stage] = n
        _write_manifest(out_dir, stage, {
            "stage": stage, "input": fp, "n_rejects": n,
            "sec": round(time.time() - t0, 3)})
        return ds

    # ---- stage 1: quality + language gate (stateless, no shuffle) ----
    def compute_low_quality():
        from ..functions.textops import LangId, quality_score

        def gate(t: pa.Table) -> pa.Table:
            q = quality_score(t)
            lg = LangId()(t)
            bad = pc.or_(pc.less(q.column("quality"), quality_min),
                         pc.not_equal(lg.column("lang_pred"), lang))
            ids = t.filter(bad).column("doc_id").cast(pa.int64())
            return pa.table({"doc_id": ids,
                             "route": pa.array(["low_quality"] * len(ids),
                                               pa.string())})

        return docs.map_batches(gate, batch_format="pyarrow")

    reject_ds.append(run_stage("low_quality", compute_low_quality))

    # ---- stage 2: exact dedup keep-first among survivors ----
    def compute_exact_dup():
        from ..functions.dedup import exact_dedup_keep_first
        from ..functions.joins import hash_join

        surv = _survivors(docs, reject_ds)
        keep = exact_dedup_keep_first(surv).map_batches(
            lambda t: pa.table({"kid": t.column("doc_id").cast(pa.int64())}),
            batch_format="pyarrow")
        j = hash_join(surv.map_batches(
            lambda t: t.select(["doc_id"]), batch_format="pyarrow"),
            keep, "doc_id", "kid", how="left")
        return j.map_batches(
            lambda t: (lambda ids: pa.table({
                "doc_id": ids,
                "route": pa.array(["exact_dup"] * len(ids), pa.string())}))(
                t.filter(pc.is_null(t.column("kid")))
                .column("doc_id").cast(pa.int64())),
            batch_format="pyarrow")

    reject_ds.append(run_stage("exact_dup", compute_exact_dup))

    # ---- stage 3: benchmark decontamination (Bloom + exact verify) ----
    def compute_contaminated():
        from ..functions.textops import decontaminate_bloom, derive_needle_grams

        surv = _survivors(docs, reject_ds)
        needles = derive_needle_grams(docs, n=8, modulus=37)
        hits = decontaminate_bloom(surv, needles, n=8)
        return hits.map_batches(
            lambda t: pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "route": pa.array(["contaminated"] * t.num_rows,
                                  pa.string())}),
            batch_format="pyarrow")

    reject_ds.append(run_stage("contaminated", compute_contaminated))

    # ---- stage 4: near-dup dedup among survivors ----
    def compute_near_dup():
        from ..functions.dedup import (cluster_pairs, minhash_candidates,
                                       verify_pairs_jaccard)

        surv = _survivors(docs, reject_ds)
        cands = minhash_candidates(surv)
        verified = verify_pairs_jaccard(cands, surv,
                                        min_jaccard=jaccard_min)
        pairs = verified.map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("jaccard"),
                                                jaccard_min))
            .select(["doc_a", "doc_b"]),
            batch_format="pyarrow")
        clusters = cluster_pairs(pairs)
        return clusters.map_batches(
            lambda t: (lambda ids: pa.table({
                "doc_id": ids,
                "route": pa.array(["near_dup"] * len(ids), pa.string())}))(
                t.filter(pc.not_equal(t.column("doc_id"),
                                      t.column("cluster_id")))
                .column("doc_id").cast(pa.int64())),
            batch_format="pyarrow")

    reject_ds.append(run_stage("near_dup", compute_near_dup))

    # ---- final: redact + write kept docs (atomic tmp + rename) ----
    from ..functions.textops import redact_pii

    kept = _survivors(docs, reject_ds).map_batches(
        redact_pii, batch_format="pyarrow").map_batches(
        lambda t: t.select(["doc_id", "text"]), batch_format="pyarrow")
    final = os.path.join(out_dir, "kept")
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(final, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    kept.write_parquet(tmp)
    os.replace(tmp, final)
    n_kept = ray.data.read_parquet(final).count()
    _write_manifest(out_dir, "final", {
        "stage": "final", "input": fp, "routes": route_counts,
        "n_kept": n_kept})
    return {"routes": route_counts, "kept": n_kept,
            "resumed_stages": resumed}
