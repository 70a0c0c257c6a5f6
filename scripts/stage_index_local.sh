#!/bin/bash
# Stage index artifacts onto local fast storage before serving.
#
# Analog of the reference's NFS->local index staging
# (/root/reference/scripts/setup_local_faiss.sh:1-75): on deployments where
# INDEX_PATH lives on slow shared storage, copy the index npz + document
# store + fused-pipeline token store to a local cache dir (space-checked,
# size-compared refresh), then print the env exports to serve from it.
#
# Usage:
#   INDEX_PATH=artifacts/corpus_1m/index.npz ./scripts/stage_index_local.sh
#   source <(./scripts/stage_index_local.sh | grep '^export')

set -e

SOURCE_INDEX="${INDEX_PATH:-artifacts/corpus/index.npz}"
LOCAL_DIR="${RAGTPU_LOCAL_CACHE:-/tmp/ragtpu-index-cache}"

if [[ ! -f "$SOURCE_INDEX" ]]; then
    echo "ERROR: source index not found: $SOURCE_INDEX" >&2
    exit 1
fi

SRC_DIR="$(dirname "$SOURCE_INDEX")"
# stage everything the serving stack mmaps/loads alongside the index
FILES=("$SOURCE_INDEX")
for extra in documents.ragdoc documents.db doc_tokens.npy doc_tokens_mask.npy; do
    [[ -f "$SRC_DIR/$extra" ]] && FILES+=("$SRC_DIR/$extra")
done

REQUIRED_MB=100
for f in "${FILES[@]}"; do
    REQUIRED_MB=$((REQUIRED_MB + $(stat -c%s "$f") / 1024 / 1024))
done
AVAILABLE_MB=$(df -m "$(dirname "$LOCAL_DIR")" | tail -1 | awk '{print $4}')
echo "staging ${#FILES[@]} files, required ${REQUIRED_MB} MB, available ${AVAILABLE_MB} MB" >&2
if [[ $AVAILABLE_MB -lt $REQUIRED_MB ]]; then
    echo "WARNING: not enough local space — serving will read from the source path" >&2
    echo "         (the native doc store already mmaps; only the npz load pays)" >&2
    exit 0
fi

mkdir -p "$LOCAL_DIR"
for f in "${FILES[@]}"; do
    base="$(basename "$f")"
    dst="$LOCAL_DIR/$base"
    if [[ -f "$dst" && $(stat -c%s "$f") -eq $(stat -c%s "$dst") ]]; then
        echo "cached: $base (size matches)" >&2
        continue
    fi
    echo "copying $base ..." >&2
    cp -f "$f" "$dst.tmp" && mv -f "$dst.tmp" "$dst"
done

echo "export INDEX_PATH=$LOCAL_DIR/$(basename "$SOURCE_INDEX")"
if [[ -f "$LOCAL_DIR/documents.ragdoc" ]]; then
    echo "export DOCUMENT_DB_PATH=$LOCAL_DIR/documents.ragdoc"
elif [[ -f "$LOCAL_DIR/documents.db" ]]; then
    echo "export DOCUMENT_DB_PATH=$LOCAL_DIR/documents.db"
fi
[[ -f "$LOCAL_DIR/doc_tokens.npy" ]] && echo "export DOC_TOKENS_PATH=$LOCAL_DIR/doc_tokens.npy"
