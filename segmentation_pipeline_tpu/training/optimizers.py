"""Optimizer factories with torch-style names/args (optax-backed).

The reference registers torch.optim.Adam/SGD in its configs
(main_config.py:128, msseg2.py:94); these factories keep that config surface
while producing optax GradientTransformations.
"""
from __future__ import annotations

import optax


def _accumulate(tx: optax.GradientTransformation,
                every_k: int) -> optax.GradientTransformation:
    """Gradient accumulation: average grads over every_k micro-batches and
    apply one optimizer step (beyond-HBM effective batch sizes; the train
    step stays one fused XLA program per micro-batch)."""
    if every_k and every_k > 1:
        return optax.MultiSteps(tx, every_k_schedule=every_k)
    return tx


def Adam(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, decoupled: bool = False,
         accumulate_steps: int = 1,
         **_ignored) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: weight_decay adds wd*param to the
    GRADIENT before the adaptive moments (L2-into-grad), which follows a
    different trajectory than decoupled AdamW — pass decoupled=True for
    AdamW."""
    if weight_decay and decoupled:
        tx = optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
                         weight_decay=weight_decay)
    elif weight_decay:
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps))
    else:
        tx = optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)
    return _accumulate(tx, accumulate_steps)


def SGD(lr: float = 1e-2, momentum: float = 0.0, nesterov: bool = False,
        weight_decay: float = 0.0, accumulate_steps: int = 1,
        **_ignored) -> optax.GradientTransformation:
    tx = optax.sgd(learning_rate=lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return _accumulate(tx, accumulate_steps)
