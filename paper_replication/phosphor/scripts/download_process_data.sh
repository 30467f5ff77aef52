#!/usr/bin/env bash
# Phosphor paper data acquisition: Ilm-NMR-P31 experimental 31P shifts
# (github clacor/Ilm-NMR-P31) processed into P-environment targets, plus the
# simulated 31P pretraining set (Zenodo 14971859).
# (reference paper_replication/phosphor/scripts/download_process_data.sh)
set -euo pipefail
OUT=${1:?usage: download_process_data.sh <output_folder>}
HERE=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$OUT"

echo "Downloading Ilm-NMR-P31 data"
curl -L -o "$OUT/hack_data.csv" \
  "https://raw.githubusercontent.com/clacor/Ilm-NMR-P31/refs/heads/master/Ilm-NMR-P31.csv"

echo "Processing Ilm-NMR-P31 data (P-environment targets)"
mkdir -p "$OUT/hack_clean"
python "$HERE/process_hack_data.py" --data_path "$OUT/hack_data.csv" --output_path "$OUT/hack_clean"

echo "Downloading simulated 31P pretraining set (Zenodo 14971859)"
mkdir -p "$OUT/pretraining"
curl -L -o "$OUT/pretraining/pretraining_data.parquet" \
  "https://zenodo.org/records/14971859/files/simulated_p_nmr.parquet?download=1"
