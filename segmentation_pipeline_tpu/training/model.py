"""SegModel: the runtime-facing model object.

Wraps a flax module + its variables behind the channel-first (N, C, W, H, D)
API the rest of the framework speaks (parity with how the reference's
predictors/trainer call ``model(x)``), while the module itself runs
channels-last on device.  Inference calls are jitted and cached per input
shape; training updates flow back in via ``update_variables`` from the
jitted train step (training/train_step.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_channels_last(x):
    """(N, C, W, H, D) -> (N, W, H, D, C)."""
    return jnp.moveaxis(x, 1, -1)


def to_channels_first(x):
    """(N, W, H, D, C) -> (N, C, W, H, D)."""
    return jnp.moveaxis(x, -1, 1)


class SegModel:
    """Owns module + variables; lazily initialized from the first batch."""

    def __init__(self, module, seed: int = 0, compute_dtype=None):
        self.module = module
        self.seed = seed
        # mixed-precision inference: run the network in this dtype (e.g.
        # 'bfloat16'); params stay float32, outputs are cast back to float32.
        # Stored as a string/None so SegModel configs pickle cleanly.
        self._compute_dtype = compute_dtype
        self.variables: Optional[Dict[str, Any]] = None
        self._eval_fn = None

    def __getstate__(self):
        # jitted closures don't pickle; rebuild lazily after load
        state = dict(self.__dict__)
        state["_eval_fn"] = None
        return state

    def __setstate__(self, state):
        # pickles from before compute_dtype became a property stored the
        # value under the public name
        if "compute_dtype" in state and "_compute_dtype" not in state:
            state["_compute_dtype"] = state.pop("compute_dtype")
        self.__dict__.update(state)

    @property
    def compute_dtype(self):
        return self._compute_dtype

    @compute_dtype.setter
    def compute_dtype(self, value):
        # invalidate the jitted eval fn so a dtype set AFTER first use
        # (trainer propagation, inference --bf16) is never silently ignored
        if value != getattr(self, "_compute_dtype", None):
            self._eval_fn = None
        self._compute_dtype = value

    # ---- init ----------------------------------------------------------
    def ensure_initialized(self, x_cf: jnp.ndarray):
        """x_cf: channel-first example batch."""
        if self.variables is not None:
            return
        x_cl = to_channels_last(jnp.asarray(x_cf[:1], dtype=jnp.float32))
        rng = jax.random.PRNGKey(self.seed)
        # jit the init: unjitted flax init executes op-by-op (very slow under
        # remote-compile TPU backends); one fused compile instead.
        init_fn = jax.jit(partial(self.module.init, train=False))
        self.variables = init_fn({"params": rng, "dropout": rng}, x_cl)

    @property
    def params(self):
        return self.variables["params"]

    @property
    def batch_stats(self):
        return self.variables.get("batch_stats", {})

    def update_variables(self, params, batch_stats=None):
        new_vars = dict(self.variables) if self.variables else {}
        new_vars["params"] = params
        if batch_stats is not None:
            new_vars["batch_stats"] = batch_stats
        self.variables = new_vars

    # ---- inference -----------------------------------------------------
    def _build_eval_fn(self):
        module = self.module
        dtype = None
        if self.compute_dtype is not None:
            dtype = jnp.dtype(self.compute_dtype)
            if dtype == jnp.dtype(jnp.float32):
                dtype = None

        @jax.jit
        def eval_fn(variables, x_cl):
            if dtype is not None:
                x_cl = x_cl.astype(dtype)
            y = module.apply(variables, x_cl, train=False)
            return y.astype(jnp.float32)

        return eval_fn

    def __call__(self, x) -> jnp.ndarray:
        """Channel-first in, channel-first out; eval mode (no dropout, running
        BN stats) — matches ``model.eval()`` usage in ref prediction.py."""
        x = jnp.asarray(x, dtype=jnp.float32)
        self.ensure_initialized(x)
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        y_cl = self._eval_fn(self.variables, to_channels_last(x))
        return to_channels_first(y_cl)

    def apply_channels_last(self, x_cl, train: bool = False, rngs=None, mutable=None):
        self.ensure_initialized(to_channels_first(x_cl))
        if mutable:
            return self.module.apply(self.variables, x_cl, train=train, rngs=rngs,
                                     mutable=mutable)
        return self.module.apply(self.variables, x_cl, train=train, rngs=rngs)

    # ---- checkpointing -------------------------------------------------
    def state_dict(self) -> Dict[str, Any]:
        if self.variables is None:
            return {}
        return jax.tree_util.tree_map(np.asarray, self.variables)

    def load_state_dict(self, state: Dict[str, Any]):
        if state:
            self.variables = jax.tree_util.tree_map(jnp.asarray, state)

    @property
    def num_params(self) -> int:
        if self.variables is None:
            return 0
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.params))
