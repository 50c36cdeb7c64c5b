#!/usr/bin/env bash
# Benchmark sweep driver (reference run/run_15K.sh / run_100K.sh).
#
#   ./run/sweep.sh -m bootea -s 15K -d "EN_FR_15K_V1 EN_DE_15K_V1" \
#                  -f "1 2 3 4 5" -o full -l logs/
#
# -m method (preset name, see openea_tpu/presets.py)
# -s scale: 15K | 100K
# -d datasets (space-separated folder names under the data root)
# -f folds (721_5fold splits)
# -o mode: full | test | rev | wo_attr | mesh (multi-chip)
# -l log dir
# -t data root (overrides the preset's training_data, e.g. /tmp/verify_ds)
set -u

method=bootea
scale=15K
datasets="EN_FR_15K_V1"
folds="1"
mode=full
logdir=logs
dataroot=""

while getopts "m:s:d:f:o:l:t:" opt; do
  case $opt in
    m) method="$OPTARG" ;;
    s) scale="$OPTARG" ;;
    d) datasets="$OPTARG" ;;
    f) folds="$OPTARG" ;;
    o) mode="$OPTARG" ;;
    l) logdir="$OPTARG" ;;
    t) dataroot="$OPTARG" ;;
    *) echo "usage: $0 [-m method] [-s scale] [-d datasets] [-f folds] [-o mode] [-l logdir] [-t dataroot]"; exit 1 ;;
  esac
done
if [ -n "$dataroot" ]; then
  export OPENEA_DATA_ROOT="$dataroot"
fi

mkdir -p "$logdir"
for ds in $datasets; do
  for fold in $folds; do
    stamp=$(date +%Y%m%d%H%M%S)
    log="$logdir/${method}_${ds}_${fold}_${mode}_${stamp}.log"
    echo ">>> $method $ds fold $fold ($mode) -> $log"
    python -m openea_tpu.cli.main_from_args "preset:${method}_${scale}" \
      "$ds" "721_5fold/$fold/" "$mode" > "$log" 2>&1
  done
done

# fold summary CSV (reference run/statistics/log2excel.py)
python - "$logdir" "$method" <<'EOF'
import glob, sys
from openea_tpu.statistics import logs_to_csv
logdir, method = sys.argv[1], sys.argv[2]
logs = sorted(glob.glob(f"{logdir}/{method}_*.log"))
if logs:
    rows = logs_to_csv(logs, f"{logdir}/{method}_summary.csv")
    if rows:
        print("summary:", f"{logdir}/{method}_summary.csv")
    else:
        print("summary: no accurate-result lines found in",
              len(logs), "log(s) — check the run logs for errors")
EOF
