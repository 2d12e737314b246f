"""Device-mesh construction.

The reference has no distribution layer at all (SURVEY.md §2.3 — grep
verified); sfast_tpu adds it the TPU-native way: a named
``jax.sharding.Mesh`` + sharding annotations, with XLA GSPMD inserting
the collectives over ICI.  No hand-written communication backend exists
or is needed — the idiomatic analog of the reference's "use vendor
libraries, don't write comms" philosophy (SURVEY.md §5).

Axes convention:
- ``dp``: data parallel (batch)
- ``tp``: tensor parallel (attention heads / MLP columns)
- ``sp``: sequence/spatial parallel (reserved; used by ring attention)
"""

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("dp", "tp"),
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    ``shape=None`` puts all devices on the last axis (pure TP for a
    single-host inference server; pure DP if axis_names=('dp',)).
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
