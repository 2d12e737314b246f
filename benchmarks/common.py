"""Shared benchmark utilities.

``zeros_on_device``: placeholder weights for latency benchmarks — TPU
latency is weight-value independent, and the two warm-start taxes
measured in round 2 (host random init ~135 s/model; ~0.33 s per device
buffer over the tunnel → ~230 s for a 700-leaf UNet) are avoided by
shape-only host init + packed (one-flat-buffer-per-dtype) device zeros.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def zeros_on_device(init_fn):
    from sfast_tpu.models.layers import shape_only_init
    from sfast_tpu.runtime.packed_params import packed_zeros_like

    with shape_only_init():
        host = init_fn()
    return packed_zeros_like(host)
