#!/usr/bin/env bash
# IR paper data acquisition: multimodal dataset (Zenodo 14770232), synthetic
# IR (Zenodo 7928396), pseudo-experimental augmentation spectra (Zenodo
# 15116374), then trim/dedupe via process_data.py.
# (reference paper_replication/ir/scripts/download_process_data.sh)
set -euo pipefail
OUT=${1:?usage: download_process_data.sh <output_folder>}
HERE=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$OUT/raw_data"

echo "Downloading multimodal spectroscopic dataset (Zenodo 14770232)"
curl -L -o "$OUT/raw_data/mm_dataset.zip" \
  "https://zenodo.org/records/14770232/files/multimodal_spectroscopic_dataset.zip?download=1"
unzip -o "$OUT/raw_data/mm_dataset.zip" -d "$OUT/raw_data/"
rm "$OUT/raw_data/mm_dataset.zip"

echo "Downloading synthetic IR data (Zenodo 7928396)"
curl -L -o "$OUT/raw_data/synth_ir_data.zip" \
  "https://zenodo.org/records/7928396/files/IRtoMol.zip?download=1"
unzip -o "$OUT/raw_data/synth_ir_data.zip" -d "$OUT/raw_data/"
rm "$OUT/raw_data/synth_ir_data.zip"

echo "Downloading pseudo-experimental spectra (Zenodo 15116374)"
mkdir -p "$OUT/pseudo_experimental"
curl -L -o "$OUT/pseudo_experimental/pseudo_experimental.zip" \
  "https://zenodo.org/records/15116374/files/pseudo_experimental.zip?download=1"
unzip -o "$OUT/pseudo_experimental/pseudo_experimental.zip" -d "$OUT/pseudo_experimental/"
rm "$OUT/pseudo_experimental/pseudo_experimental.zip"

echo "Processing IR spectra"
python "$HERE/process_data.py" --input_dir "$OUT/raw_data" --output_dir "$OUT/processed"
