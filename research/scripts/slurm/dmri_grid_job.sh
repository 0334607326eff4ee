#!/bin/bash
# Grid task: one (augmentation_mode, fold) cell per array task id.
#SBATCH --array=0-19
#SBATCH --nodes=1
#SBATCH --cpus-per-task=8
#SBATCH --time=0-9:0:0

python -m research.dmri_hippo.run augmentation_experiment_grid \
    "$DATASET_PATH" "$LOGS_PATH" \
    --work-path "${SLURM_TMPDIR:-/tmp}" \
    --task-id "${SLURM_ARRAY_TASK_ID:-0}"
