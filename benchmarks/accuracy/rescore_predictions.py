"""Re-score a saved predictions JSON, optionally with rejection sampling.

The table-4 recipe evaluates the SAME beam-30 decode with and without
rejection sampling (reference replicate_table_4.sh runs the full predict
twice; rejection is host-side post-processing, reference utils.py:44-83).
One on-chip decode + this offline re-score produces both rows without
paying the decode twice.

Usage:
  python benchmarks/accuracy/rescore_predictions.py \
      /path/test_data_logits_beam_30.json [--reject] [--out metrics.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("predictions_json")
    ap.add_argument("--reject", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from multimodalanalytical_tpu.evaluation.metrics import (
        calc_sampling_metrics, reject_sample,
    )

    with open(args.predictions_json) as f:
        predictions = json.load(f)
    if args.reject:
        predictions = reject_sample(predictions, molecules=True)
    metrics = calc_sampling_metrics(
        predictions["predictions"], predictions["targets"],
        molecules=True, logging=True,
    )
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f)


if __name__ == "__main__":
    main()
