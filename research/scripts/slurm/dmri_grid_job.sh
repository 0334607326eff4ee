#!/bin/bash
# Grid task: one (augmentation_mode, fold) cell per array task id.
#SBATCH --array=0-19
#SBATCH --nodes=1
#SBATCH --cpus-per-task=8
#SBATCH --time=0-9:0:0

# persist XLA executables across array tasks and relaunches (LOGS_PATH outlives per-task SLURM_TMPDIRs)
# (first task pays the compiles; the rest start warm — docs/performance.md #8)
export SP_COMPILATION_CACHE="${SP_COMPILATION_CACHE:-${LOGS_PATH:-/tmp}/xla_cache}"

python -m research.dmri_hippo.run augmentation_experiment_grid \
    "$DATASET_PATH" "$LOGS_PATH" \
    --work-path "${SLURM_TMPDIR:-/tmp}" \
    --task-id "${SLURM_ARRAY_TASK_ID:-0}"
