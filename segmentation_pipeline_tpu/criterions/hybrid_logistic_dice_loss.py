"""Hybrid soft-Dice + logistic loss.

Behavioral parity with ref criterions/hybrid_logistic_dice_loss.py:6-43:
squared-denominator soft Dice per (subject, class), eps-shifted log loss with
optional per-class weights, convex mix by dice_weight. Operates channels-last
(N, W, H, D, C) — spatial reduction axes (1, 2, 3) are the transpose of the
reference's (2, 3, 4); the math is identical.  Pure jax; jit/grad-safe.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from jax import lax


class HybridLogisticDiceLoss:
    def __init__(self, dice_weight: float = 0.5,
                 logistic_class_weights: Optional[Sequence[float]] = None,
                 square_dice: bool = True,
                 spatial_axis_name=None, batch_axis_name=None):
        self.dice_weight = dice_weight
        self.logistic_class_weights = (
            None if logistic_class_weights is None
            else jnp.asarray(logistic_class_weights, dtype=jnp.float32))
        self.square_dice = square_dice
        # shard_map support: with spatial_axis_name set, per-sample voxel sums
        # are psum'd across the W-sharded mesh axis (each device holds a slab
        # of every sample); with batch_axis_name set, the final batch means
        # are pmean'd across the data-sharded axis.  Both None -> the plain
        # single-program math above, bit-identical.
        self.spatial_axis_name = spatial_axis_name
        self.batch_axis_name = batch_axis_name

    def __call__(self, prediction: jnp.ndarray, target: jnp.ndarray) -> dict:
        """prediction/target: (N, W, H, D, C) softmax probs vs one-hot."""
        spatial = (1, 2, 3)
        eps = 1e-8

        overlap = jnp.sum(prediction * target, axis=spatial)
        if self.square_dice:
            total = (jnp.sum(target * target, axis=spatial)
                     + jnp.sum(prediction * prediction, axis=spatial))
        else:
            total = jnp.sum(target, axis=spatial) + jnp.sum(prediction, axis=spatial)

        prediction_safe = (prediction + eps) / (1 + eps)
        logistic = jnp.mean(target * jnp.log(prediction_safe), axis=spatial)

        if self.spatial_axis_name is not None:
            # equal-size W slabs: psum completes the per-sample voxel sums,
            # pmean completes the per-sample voxel mean
            overlap = lax.psum(overlap, self.spatial_axis_name)
            total = lax.psum(total, self.spatial_axis_name)
            logistic = lax.pmean(logistic, self.spatial_axis_name)

        dice_coeffs = 2 * overlap / (total + eps)
        if self.logistic_class_weights is not None:
            logistic = logistic * self.logistic_class_weights[None]

        logistic_loss = jnp.mean(-logistic)
        dice_loss = jnp.mean(1 - dice_coeffs)
        if self.batch_axis_name is not None:
            logistic_loss = lax.pmean(logistic_loss, self.batch_axis_name)
            dice_loss = lax.pmean(dice_loss, self.batch_axis_name)

        t = self.dice_weight
        hybrid_loss = (1.0 - t) * logistic_loss + t * dice_loss
        return {
            "loss": hybrid_loss,
            "dice_loss": dice_loss,
            "logistic_loss": logistic_loss,
        }
