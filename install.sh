#!/usr/bin/env bash
# Editable install (reference install.sh role). Build isolation is off:
# air-gapped environments cannot fetch build backends.
set -euo pipefail
cd "$(dirname "$0")"
python -m pip install -e . --no-deps --no-build-isolation
make -C native
python -c "import rag_inference_pipeline_tpu as r; print('installed', r.__version__)"
