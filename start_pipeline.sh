#!/usr/bin/env bash
# Multi-node local launcher (reference start_pipeline.sh:78-160): spawn
# TOTAL_NODES processes, wait for /health on each, SIGINT kills all.
set -euo pipefail
cd "$(dirname "$0")"
TOTAL_NODES=${TOTAL_NODES:-3}
BASE_PORT=${BASE_PORT:-8000}
PIDS=()
cleanup() { for p in "${PIDS[@]}"; do kill "$p" 2>/dev/null || true; done; }
trap cleanup INT TERM EXIT
for ((n=0; n<TOTAL_NODES; n++)); do
  NODE_NUMBER=$n TOTAL_NODES=$TOTAL_NODES BASE_PORT=$BASE_PORT \
    python -m rag_inference_pipeline_tpu.serve.runtime &
  PIDS+=($!)
  sleep 2
done
for ((n=0; n<TOTAL_NODES; n++)); do
  port=$((BASE_PORT + n))
  for i in $(seq 1 100); do
    if curl -fsS -m 2 "http://127.0.0.1:${port}/health" >/dev/null 2>&1; then
      echo "node $n healthy on :$port"; break
    fi
    sleep 3
  done
done
echo "pipeline up — Ctrl-C to stop"
wait
