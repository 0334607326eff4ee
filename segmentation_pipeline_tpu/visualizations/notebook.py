"""Notebook exploration widgets.

Counterpart of ref visualizations/notebook.py:26-96: interactive slice
browsers over subjects and over model feature maps.  torch forward hooks are
replaced by flax's ``capture_intermediates`` (the jax-idiomatic way to
inspect activations).  ipywidgets is optional; without it the functions
return static matplotlib figures.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.subject import Subject
from ..evaluators.contour_image_evaluator import ContourImageEvaluator

PLANES = ("Saggital", "Coronal", "Axial")


def _interact(fn, **sliders):
    try:
        from ipywidgets import interact

        return interact(fn, **sliders)
    except ImportError:
        # headless fallback: render the midpoint configuration once
        mid = {k: (v[0] + v[1]) // 2 if isinstance(v, tuple) else v
               for k, v in sliders.items()}
        return fn(**mid)


def vis_features(feature_map: np.ndarray, figsize=(12, 12)):
    """Browse a (C, W, H, D) feature map: channel x plane x slice
    (ref notebook.py:26)."""
    import matplotlib.pyplot as plt

    feature_map = np.asarray(feature_map)
    C, W, H, D = feature_map.shape

    def show(channel=0, plane="Axial", slice_id=0):
        dim = {"Saggital": W, "Coronal": H, "Axial": D}[plane]
        slice_id = min(slice_id, dim - 1)
        sl = {
            "Saggital": feature_map[channel, slice_id, :, :],
            "Coronal": feature_map[channel, :, slice_id, :],
            "Axial": feature_map[channel, :, :, slice_id],
        }[plane]
        fig = plt.figure(figsize=figsize)
        plt.imshow(sl.T, cmap="viridis", origin="lower")
        plt.title(f"channel {channel}, {plane} slice {slice_id}")
        plt.colorbar()
        return fig

    return _interact(show, channel=(0, C - 1), plane=list(PLANES),
                     slice_id=(0, max(W, H, D) - 1))


def vis_subject(subject: Subject, image_name: str,
                prediction_label_map_name: Optional[str] = None,
                target_label_map_name: Optional[str] = None,
                scale: float = 0.25, line_width: float = 1.5, legend: bool = True):
    """Interactive contour-overlay slice browser (ref notebook.py:40)."""
    _, W, H, D = subject[image_name].data.shape

    def show(plane="Axial", slice_id=0):
        evaluator = ContourImageEvaluator(
            plane=plane, image_name=image_name,
            prediction_label_map_name=prediction_label_map_name,
            target_label_map_name=target_label_map_name,
            slice_id=slice_id, legend=legend, ncol=1, scale=scale,
            line_width=line_width)
        return evaluator([subject])

    return _interact(show, plane=list(PLANES), slice_id=(0, max(W, H, D) - 1))


def vis_model(model, subject: Subject, image_name: str = "X",
              filter_pattern: Optional[str] = None):
    """Browse intermediate activations of a SegModel on one subject
    (ref notebook.py:96 used forward hooks; here flax capture_intermediates).

    Returns {layer_path: vis_features widget-or-figure factory input}, i.e. a
    dict of (C, W, H, D) activation arrays to pass to ``vis_features``.
    """
    import jax.numpy as jnp

    x = np.asarray(subject[image_name].data)[None]  # (1, C, W, H, D)
    x_cl = jnp.moveaxis(jnp.asarray(x, jnp.float32), 1, -1)
    model.ensure_initialized(jnp.asarray(x, jnp.float32))

    _, state = model.module.apply(
        model.variables, x_cl, train=False,
        capture_intermediates=True, mutable=["intermediates"])

    out = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{path}/{k}" if path else k)
        elif isinstance(tree, tuple):
            for v in tree:
                walk(v, path)
        else:
            arr = np.asarray(tree)
            if arr.ndim == 5:  # (1, W, H, D, C) -> (C, W, H, D)
                if filter_pattern is None or filter_pattern in path:
                    out[path] = np.moveaxis(arr[0], -1, 0)

    walk(state["intermediates"], "")
    return out
