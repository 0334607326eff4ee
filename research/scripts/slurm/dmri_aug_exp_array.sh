#!/bin/bash
# Job-array fan-out for the augmentation ablation (4 modes x 5 folds),
# counterpart of research/scripts/slurm/dmri_aug_exp_array.sh: each array
# task generates its share of commands and runs them with GNU parallel.
#SBATCH --array=0-19
#SBATCH --nodes=1
#SBATCH --cpus-per-task=8
#SBATCH --mem-per-cpu=8G
#SBATCH --time=0-9:0:0

export MPLBACKEND=agg
# persist XLA executables across array tasks and relaunches (LOGS_PATH outlives per-task SLURM_TMPDIRs)
# (first task pays the compiles; the rest start warm — docs/performance.md #8)
export SP_COMPILATION_CACHE="${SP_COMPILATION_CACHE:-${LOGS_PATH:-/tmp}/xla_cache}"

python -m research.dmri_hippo.generate_parallel_commands | parallel
