#!/bin/bash
# Cascade-refinement training job array, one task per fold (counterpart of
# the reference's research/scripts/slurm/dmri_cascade_job.sh 1xV100 job).
#SBATCH --array=0-4
#SBATCH --nodes=1
#SBATCH --ntasks-per-node 1
#SBATCH --cpus-per-task=8
#SBATCH --mem-per-cpu=16G
#SBATCH --time=0-12:0:0

export MPLBACKEND=agg
# persist XLA executables across array tasks and relaunches (LOGS_PATH outlives per-task SLURM_TMPDIRs)
# (first task pays the compiles; the rest start warm — docs/performance.md #8)
export SP_COMPILATION_CACHE="${SP_COMPILATION_CACHE:-${LOGS_PATH:-/tmp}/xla_cache}"

python -m research.dmri_hippo.run cascade_experiment \
    "$DATASET_PATH" \
    "$PREDICTIONS_PATH" \
    "$LOGS_PATH" \
    --work-path "${SLURM_TMPDIR:-/tmp}/${SLURM_ARRAY_TASK_ID:-0}" \
    --prior-label-name whole_roi_pred_task502 \
    --fold "${SLURM_ARRAY_TASK_ID:-0}" \
    --max-training-time 0-12:0:0 \
    --num-workers "${SLURM_CPUS_PER_TASK:-8}"
