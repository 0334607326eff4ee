"""Optimizer factories with torch-style names/args (optax-backed).

The reference registers torch.optim.Adam/SGD in its configs
(main_config.py:128, msseg2.py:94); these factories keep that config surface
while producing optax GradientTransformations.
"""
from __future__ import annotations

import optax


def Adam(lr: float = 1e-3, betas=(0.9, 0.999), eps: float = 1e-8,
         weight_decay: float = 0.0, **_ignored) -> optax.GradientTransformation:
    if weight_decay:
        return optax.adamw(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps,
                           weight_decay=weight_decay)
    return optax.adam(learning_rate=lr, b1=betas[0], b2=betas[1], eps=eps)


def SGD(lr: float = 1e-2, momentum: float = 0.0, nesterov: bool = False,
        weight_decay: float = 0.0, **_ignored) -> optax.GradientTransformation:
    tx = optax.sgd(learning_rate=lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
