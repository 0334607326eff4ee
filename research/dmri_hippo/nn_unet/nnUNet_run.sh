#!/bin/bash
# Train the external nnU-Net baseline on the exported dmri_hippo dataset
# (counterpart of ref research/dmri_hippo/nn_unet/nnUNet_run.sh — the
# reference's comparison oracle).  The dataset is produced by:
#
#     python -m research.dmri_hippo.nn_unet.convert_dataset \
#         "$DATASET_PATH" "$nnUNet_raw_data_base" --split-and-mirror
#
# nnU-Net trains on GPU/CPU nodes (it is the torch-based oracle, not part
# of this framework); run one array task per fold.
#SBATCH --array=0-4
#SBATCH --nodes=1
#SBATCH --ntasks-per-node 1
#SBATCH --cpus-per-task 8
#SBATCH --gres=gpu:1
#SBATCH --mem=32G
#SBATCH --time=0-12:0:0

set -euo pipefail

TASK_NAME="${TASK_NAME:-Task502_DMRI_Hippocampus_Whole_Split}"
MODEL="${NNUNET_MODEL:-3d_fullres}"   # train '2d' and '3d_fullres'

echo "fold ${SLURM_ARRAY_TASK_ID:-0} ${TASK_NAME} (${MODEL}) start"

# stage the preprocessed dataset on node-local SSD: nnU-Net's dataloader
# is IO-bound on network filesystems
STAGE="${SLURM_TMPDIR:-/tmp}/nnUNet_preprocessed"
mkdir -p "${STAGE}/${TASK_NAME}"
cp -r "${nnUNet_preprocessed:?set nnUNet_preprocessed}/${TASK_NAME}/" "${STAGE}/"
export nnUNet_preprocessed="${STAGE}/"
export nnUNet_n_proc_DA="${SLURM_CPUS_PER_TASK:-8}"

# -c resumes an interrupted run; remove NNUNET_RESUME for a fresh start
nnUNet_train "${MODEL}" nnUNetTrainerV2 "${TASK_NAME}" \
    "${SLURM_ARRAY_TASK_ID:-0}" ${NNUNET_RESUME:+-c} --npz
