#!/usr/bin/env bash
# Cluster entrypoint (the north rule's `ray job submit` deployment shape).
#
# On a real cluster (N or 4N nodes):
#   RAY_ADDRESS=http://<head>:8265 ./scripts/submit_job.sh IN_DIR OUT_DIR [extra args]
# submits the same CLI the single-node path runs; the pipeline itself is
# cluster-agnostic (no address/topology assumptions — partitioning and
# per-stage resources do the scaling).
#
# In this sandbox there is no cluster; the driver's stand-in evidence is
# `python bench.py --scaling` (num_cpus=4/8/16/32 in fresh processes, see
# BASELINE.md).  When RAY_ADDRESS is "local" or unset we run the CLI
# directly so this script is exercisable end-to-end.
set -euo pipefail

IN_DIR="${1:?input dir}"; OUT_DIR="${2:?output dir}"; shift 2 || true

if [ -n "${RAY_ADDRESS:-}" ] && [ "${RAY_ADDRESS}" != "local" ]; then
  exec ray job submit --working-dir "$(dirname "$0")/.." -- \
    python -m aushape_ray "$IN_DIR" "$OUT_DIR" --resume "$@"
else
  exec python -m aushape_ray "$IN_DIR" "$OUT_DIR" --resume "$@"
fi
