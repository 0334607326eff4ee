#!/bin/bash
#SBATCH --job-name=printenv
#SBATCH --partition=tpu
#SBATCH --time=0:05:00
# Environment probe (analog of ref slurm_printenv_job.sh): dump the SLURM +
# TPU runtime environment a job actually sees — the first thing to check
# when multihost initialization misbehaves.
printenv | sort
python - <<'PY'
import jax
print("devices:", jax.devices())
print("process_index:", jax.process_index(), "/", jax.process_count())
PY
