"""The jitted data-parallel train step.

TPU-native replacement for the reference's per-iteration
forward/loss/backward/step sequence (segmentation_trainer.py:168-180): one
fused XLA program — forward (train-mode BN/dropout), hybrid loss, backward,
optax update — compiled once and fed batch-sharded arrays over the mesh's
'data' axis.  GSPMD inserts the gradient all-reduce; there is no hand-written
collective here by design.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .model import to_channels_last


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, optimizer, example_batch_cf: Dict[str, Any]) -> TrainState:
    """model: SegModel; example_batch_cf: {'X': (N,C,W,H,D), 'y': ...}."""
    model.ensure_initialized(example_batch_cf["X"])
    params = model.params
    opt_state = optimizer.init(params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=model.batch_stats, opt_state=opt_state)


def _split_and_flip_cl(x: jnp.ndarray) -> jnp.ndarray:
    """Sagittal hemisphere split into the batch, channels-last (the TPU-side
    fused version of ref prediction.py:16-21). x: (N, W, H, D, C)."""
    half = x.shape[1] // 2
    first, second = x[:, :half], x[:, half:]
    return jnp.concatenate([first, jnp.flip(second, axis=1)], axis=0)


def _reverse_split_and_flip_cl(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[0] // 2
    first, second = x[:half], x[half:]
    return jnp.concatenate([first, jnp.flip(second, axis=1)], axis=1)


def make_train_step(module, criterion, optimizer, mesh: Optional[Mesh] = None,
                    data_axis: str = "data", sagittal_split: bool = False):
    """Returns train_step(state, batch_cl, rng) -> (state, metrics, y_pred).

    batch_cl: {'X': (N, W, H, D, C), 'y': (N, W, H, D, C)} channels-last.
    Forward (optionally through the sagittal-split batching trick), hybrid
    loss, backward, and the optax update fuse into one XLA program.  With a
    mesh, inputs are expected batch-sharded over ``data_axis`` and the state
    replicated; without one it is a plain single-device jit.  The (train-mode)
    prediction is returned for scheduled training evaluators
    (ref segmentation_trainer.py:182-191).
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params}
        mutable = []
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"]
        x = batch["X"]
        if sagittal_split:
            x = _split_and_flip_cl(x)
        out = module.apply(variables, x, train=True,
                           rngs={"dropout": rng}, mutable=mutable)
        if mutable:
            y_pred, new_vars = out
            new_batch_stats = new_vars.get("batch_stats", batch_stats)
        else:
            y_pred, new_batch_stats = out, batch_stats
        if sagittal_split:
            y_pred = _reverse_split_and_flip_cl(y_pred)
        loss_dict = criterion(y_pred, batch["y"])
        return loss_dict["loss"], (loss_dict, new_batch_stats, y_pred)

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray], rng) -> tuple:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss_dict, new_batch_stats, y_pred)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_batch_stats, opt_state=new_opt_state)
        return new_state, loss_dict, y_pred

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,))

    data = NamedSharding(mesh, P(data_axis))
    return jax.jit(
        step_fn,
        in_shardings=(None, {"X": data, "y": data}, None),
        donate_argnums=(0,),
    )


def collate_to_device(batch_cf: Dict[str, Any], mesh: Optional[Mesh] = None,
                      data_axis: str = "data") -> Dict[str, jnp.ndarray]:
    """Channel-first host batch -> channels-last device batch, batch-sharded
    over the mesh when given (the host->device boundary; the TPU analog of
    ref utils/utils.py:75-85 collate + .to(device))."""
    out = {k: to_channels_last(jnp.asarray(v, dtype=jnp.float32))
           for k, v in batch_cf.items()}
    if mesh is not None:
        sharding = NamedSharding(mesh, P(data_axis))
        out = {k: jax.device_put(v, sharding) for k, v in out.items()}
    return out
