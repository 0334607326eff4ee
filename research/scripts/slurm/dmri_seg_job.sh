#!/bin/bash
# Single dmri_hippo training job on a TPU host (counterpart of the
# reference's 1xV100 SLURM job, research/scripts/slurm/dmri_seg_job.sh).
#SBATCH --nodes=1
#SBATCH --ntasks-per-node 1
#SBATCH --cpus-per-task=8
#SBATCH --mem-per-cpu=16G
#SBATCH --time=0-8:0:0

export MPLBACKEND=agg
# persist XLA executables across array tasks and relaunches (LOGS_PATH outlives per-task SLURM_TMPDIRs)
# (first task pays the compiles; the rest start warm — docs/performance.md #8)
export SP_COMPILATION_CACHE="${SP_COMPILATION_CACHE:-${LOGS_PATH:-/tmp}/xla_cache}"

python -m research.dmri_hippo.run augmentation_experiment \
    "$DATASET_PATH" \
    "$LOGS_PATH" \
    --work-path "${SLURM_TMPDIR:-/tmp}" \
    --augmentation-mode combined \
    --max-training-time 0-8:0:0 \
    --num-workers "${SLURM_CPUS_PER_TASK:-8}"
