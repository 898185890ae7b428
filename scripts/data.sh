#!/usr/bin/env bash
# Data pipeline entry mirroring the reference's python/scripts/data.sh:
#   1) raw task txt -> processed CSVs
#   2) processed CSVs -> embedding tree (img + txt, all encoder coefs)
# Usage: scripts/data.sh <task_1.txt> [task_2.txt ...]
set -euo pipefail
cd "$(dirname "$0")/.."

python -m eeg_multimodal_tpu.cli process "$@" --out data/processed
python -m eeg_multimodal_tpu.cli embed --data_root .
