#!/bin/bash
# Interactive TPU debugging session (analog of ref research/scripts/slurm/
# interactive_job.sh which requested an interactive V100 allocation).
# On a TPU-VM cluster managed by SLURM, request one v5e host interactively:
#
#   salloc --partition=tpu --gres=tpu:v5e-8 --cpus-per-task=16 \
#          --mem=64G --time=4:00:00 srun --pty bash
#
# Inside the allocation the JAX TPU runtime attaches automatically
# (no CUDA_VISIBLE_DEVICES equivalent needed; one process sees all local
# chips). Verify with:
#
#   python -c "import jax; print(jax.devices())"
salloc --partition=tpu --gres=tpu:v5e-8 --cpus-per-task=16 --mem=64G \
       --time=4:00:00 srun --pty bash
