#!/bin/bash
# Full-budget flagship quality run (VERDICT r2 #2): the reference's 50k-step
# training budget (opt2.py:66) at the TPU-friendly batch, through the full
# pipeline (train -> eval -> regional tables), under the stall watchdog with
# auto-resume.  Produces the run dir tools/quality_report.py turns into
# docs/QUALITY_r3.md.
#
#   bash tools/run_flagship.sh [IO_LOCATION]
set -e
IO=${1:-/tmp/flagship_r3}
cd "$(dirname "$0")/.."
exec python tools/watchdog_train.py --logs_dir "$IO/Logs/flagship_r3" \
    --stall_sec 900 --grace_sec 1800 --max_restarts 8 -- \
    python main.py --site_name SYNTH_FLAGSHIP --exp_name flagship_r3 \
    --IO_Location "$IO" --max_train_steps 50000 --batch_size 2048 \
    --n_samples 96 --fc_units 512 --synth_views 14 --testing_size 3 \
    --chunk 2560 --n_saves 20 --seed 0
