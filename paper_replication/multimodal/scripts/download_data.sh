#!/usr/bin/env bash
# Multimodal paper data acquisition: IR + 1H-NMR + 13C-NMR pretraining data
# (Zenodo 14770232).
# (reference paper_replication/multimodal/scripts/download_data.sh)
set -euo pipefail
OUT=${1:?usage: download_data.sh <output_folder>}
mkdir -p "$OUT"

echo "Downloading multimodal spectroscopic dataset (Zenodo 14770232)"
curl -L -o "$OUT/mm_dataset.zip" \
  "https://zenodo.org/records/14770232/files/multimodal_spectroscopic_dataset.zip?download=1"
unzip -o "$OUT/mm_dataset.zip" -d "$OUT/pretrain_data/"
rm "$OUT/mm_dataset.zip"
