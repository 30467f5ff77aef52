#!/usr/bin/env bash
# Mixture paper Table 4: real ATR mixtures, beam 30, +/- rejection sampling
# (reference paper_replication/mixture/scripts/replicate_table_4.sh:24-63)
set -euo pipefail
DATA_PATH=${1:?usage: replicate_table_4.sh <real_mixture_path> <working_dir> <ckpt> <preprocessor>}
WORK_DIR=${2:?}
CKPT=${3:?}
PREP=${4:?}
for REJECT in False True; do
  python -m multimodalanalytical_tpu.cli.predict \
    working_dir="$WORK_DIR" job_name="real_mixtures_reject_${REJECT}" \
    data=ir/patches_mixture_text data_path="$DATA_PATH" \
    splitting=test_only mixture=ir/binary_real_data_mixed \
    preprocessor_path="$PREP" \
    model=custom_model model.model_checkpoint_path="$CKPT" \
    model.n_beams=30 model.rejection_sampling="$REJECT" \
    molecules=True
done
