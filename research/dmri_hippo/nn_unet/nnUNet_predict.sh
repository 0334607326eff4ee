#!/bin/bash
# Predict + ensemble with the trained nnU-Net baseline models
# (counterpart of ref research/dmri_hippo/nn_unet/nnUNet_predict.sh).
# Outputs feed back into this framework via:
#
#     python -m research.dmri_hippo.nn_unet.convert_predictions \
#         <predictions> <dataset> <out>   # un-split + re-mirror hemispheres
set -euo pipefail

TASK_NAME="${TASK_NAME:-Task502_DMRI_Hippocampus_Whole_Split}"
CASES="${nnUNet_raw_data_base:?}/nnUNet_raw_data/${TASK_NAME}/imagesTs/"
OUT_ROOT="${RESULTS_FOLDER:?}/nnUNet/inference/${TASK_NAME}/predictionsTs"
ENSEMBLE_ID="ensemble_2d__nnUNetTrainerV2__nnUNetPlansv2.1--3d_fullres__nnUNetTrainerV2__nnUNetPlansv2.1"

for MODEL in 2d 3d_fullres; do
    nnUNet_predict \
        -i "${CASES}" \
        -o "${OUT_ROOT}/${MODEL}/" \
        -tr nnUNetTrainerV2 \
        -ctr nnUNetTrainerV2CascadeFullRes \
        -m "${MODEL}" \
        -p nnUNetPlansv2.1 \
        -t "${TASK_NAME}" \
        --save_npz
done

nnUNet_ensemble \
    -f "${OUT_ROOT}/2d/" "${OUT_ROOT}/3d_fullres/" \
    -o "${OUT_ROOT}/ensemble/" \
    -pp "${RESULTS_FOLDER}/nnUNet/ensembles/${TASK_NAME}/${ENSEMBLE_ID}/postprocessing.json" \
    --npz
