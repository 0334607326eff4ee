"""Cross-cutting helpers.

TPU-native re-design of the reference's ``segmentation_pipeline/utils/utils.py``
(see /root/reference/segmentation_pipeline/utils/utils.py:15-199 for the
behavioral spec).  Pure host-side Python; no torch.
"""
from __future__ import annotations

import random
from typing import Any, Dict, Sequence


def no_op(batch):
    """Identity collate: a batch is a list of Subjects (ref utils.py:15)."""
    return batch


def is_sequence(x) -> bool:
    return isinstance(x, (list, tuple))


def as_list(x) -> list:
    if isinstance(x, list):
        return x
    if isinstance(x, tuple):
        return list(x)
    return [x]


def as_tuple(x) -> tuple:
    """None -> (), sequence -> tuple, scalar -> 1-tuple (ref utils.py:31-36)."""
    if x is None:
        return ()
    if is_sequence(x):
        return tuple(x)
    return (x,)


def load_module(path):
    """Import a python file by path as a module (ref utils.py:57-61) — the
    reference CLIs load experiment configs this way."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(Path(path).stem, str(path))
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def as_set(x) -> set:
    if isinstance(x, (list, tuple, set, frozenset, range)):
        return set(x)
    return {x}


def vargs_or_sequence(args):
    """Accept either varargs or a single sequence argument (ref utils.py)."""
    if len(args) == 1 and is_sequence(args[0]):
        return list(args[0])
    return list(args)


def flatten_nested_dict(nested: Dict, prefix: str = "", sep: str = ".") -> Dict[str, Any]:
    """Flattens {'a': {'b': 1}} -> {'a.b': 1} (ref utils.py:88)."""
    out = {}
    for key, value in nested.items():
        full_key = f"{prefix}{sep}{key}" if prefix else str(key)
        if isinstance(value, dict):
            out.update(flatten_nested_dict(value, full_key, sep))
        else:
            out[full_key] = value
    return out


def auto_str(obj) -> str:
    """repr built from __dict__ (ref utils.py:123)."""
    params = ", ".join(f"{k}={v!r}" for k, v in vars(obj).items() if not k.startswith("_"))
    return f"{type(obj).__name__}({params})"


def random_folds(num_items: int, num_folds: int, seed: int = 0) -> list:
    """Deterministically assign each of num_items to one of num_folds
    (even sizes up to remainder).  Mirrors ref utils.py:144."""
    fold_ids = [i % num_folds for i in range(num_items)]
    rng = random.Random(seed)
    rng.shuffle(fold_ids)
    return fold_ids


def time_str_to_seconds(time_str) -> float:
    """Parse SLURM-style 'D-HH:MM:SS' / 'HH:MM:SS' / 'MM:SS' / seconds
    (ref utils.py:187)."""
    if isinstance(time_str, (int, float)):
        return float(time_str)
    days = 0
    s = str(time_str)
    if "-" in s:
        day_part, s = s.split("-")
        days = int(day_part)
    parts = [int(p) for p in s.split(":")]
    seconds = 0
    for p in parts:
        seconds = seconds * 60 + p
    return days * 86400 + seconds


def filter_kwargs(cls_or_fn, kwargs: Dict[str, Any]) -> Dict[str, Any]:
    """Keep only kwargs accepted by the callable's signature
    (ref models/utils.py:4)."""
    import inspect

    sig = inspect.signature(cls_or_fn)
    if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()):
        return dict(kwargs)
    return {k: v for k, v in kwargs.items() if k in sig.parameters}


def prod(seq: Sequence[int]) -> int:
    out = 1
    for x in seq:
        out *= x
    return out
