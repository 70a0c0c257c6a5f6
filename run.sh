#!/usr/bin/env bash
# Single-node launcher (reference run.sh): env guards + optional device trace.
# PROFILE_WITH_TRACE=1 wraps the node in a jax.profiler trace capture — the
# TPU analog of the reference's Scalene wrapper (run.sh:19-59).
set -euo pipefail
export TOKENIZERS_PARALLELISM=${TOKENIZERS_PARALLELISM:-false}
cd "$(dirname "$0")"
if [[ "${PROFILE_WITH_TRACE:-0}" == "1" ]]; then
  export RAGTPU_TRACE_DIR="${RAGTPU_TRACE_DIR:-/tmp/ragtpu_traces/node${NODE_NUMBER:-0}}"
fi
exec python -m rag_inference_pipeline_tpu.serve.runtime "$@"
