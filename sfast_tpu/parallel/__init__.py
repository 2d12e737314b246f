from sfast_tpu.parallel.mesh import make_mesh
from sfast_tpu.parallel.sharding import (
    unet_param_spec,
    shard_params,
    batch_spec,
    replicated,
)

__all__ = [
    "make_mesh",
    "unet_param_spec",
    "shard_params",
    "batch_spec",
    "replicated",
]
