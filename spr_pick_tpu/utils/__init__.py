from spr_pick_tpu.utils.metrics import (
    Metric,
    MetricDict,
    TrackedTime,
    seconds_to_dhms,
    separator,
)
from spr_pick_tpu.utils.schedule import compute_ramped_lrate, insize_from_outsize
from spr_pick_tpu.utils.misc import list_constants, cd

__all__ = [
    "Metric",
    "MetricDict",
    "TrackedTime",
    "seconds_to_dhms",
    "separator",
    "compute_ramped_lrate",
    "insize_from_outsize",
    "list_constants",
    "cd",
]
