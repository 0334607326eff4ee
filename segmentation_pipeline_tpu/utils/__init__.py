from .compact_json import CompactJSONEncoder
from .config import Config, get_nested_config
from .dataset_files import prepare_dataset_files
from .misc import (
    as_list,
    as_set,
    as_tuple,
    auto_str,
    filter_kwargs,
    flatten_nested_dict,
    is_sequence,
    load_module,
    no_op,
    prod,
    random_folds,
    time_str_to_seconds,
    vargs_or_sequence,
)
from .timer import ProfilerTrace, Timer

# drop-in import parity for reference code (ref utils/torch_timer.py:6 —
# same role; this Timer synchronizes jax dispatch instead of cuda streams)
TorchTimer = Timer

__all__ = [k for k in dir() if not k.startswith("_")]
