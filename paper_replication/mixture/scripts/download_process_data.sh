#!/usr/bin/env bash
# Mixture paper data acquisition: the multimodal spectroscopic dataset
# (Zenodo 14770232) provides the pure-compound IR spectra that the streaming
# mixture synthesizer combines on the fly.
# (reference paper_replication/mixture/scripts/download_process_data.sh)
set -euo pipefail
OUT=${1:?usage: download_process_data.sh <output_folder>}
mkdir -p "$OUT/raw_data"

echo "Downloading multimodal spectroscopic dataset (Zenodo 14770232)"
curl -L -o "$OUT/raw_data/mm_dataset.zip" \
  "https://zenodo.org/records/14770232/files/multimodal_spectroscopic_dataset.zip?download=1"
unzip -o "$OUT/raw_data/mm_dataset.zip" -d "$OUT/raw_data/"
rm "$OUT/raw_data/mm_dataset.zip"
