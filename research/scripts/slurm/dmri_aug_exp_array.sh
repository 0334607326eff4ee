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

python -m research.dmri_hippo.generate_parallel_commands | parallel
