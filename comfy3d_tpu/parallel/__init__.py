from . import sharding
from .sharding import (apply_tp_sharding, data_sharding, make_mesh,
                       maybe_default_mesh, replicate, shard_pipeline,
                       tp_spec_for_path)

__all__ = ["sharding", "make_mesh", "data_sharding", "apply_tp_sharding",
           "replicate", "tp_spec_for_path", "shard_pipeline",
           "maybe_default_mesh"]
