from . import offload as offload_utils
from . import sharding
from .offload import (PipelineVault, default_vault, is_offloaded,
                      offload, restore, teardown)
from .sharding import (apply_tp_sharding, data_sharding, make_mesh,
                       maybe_default_mesh, replicate, shard_pipeline,
                       tp_spec_for_path)

__all__ = ["sharding", "make_mesh", "data_sharding", "apply_tp_sharding",
           "replicate", "tp_spec_for_path", "shard_pipeline",
           "maybe_default_mesh", "offload_utils", "offload", "restore",
           "teardown", "is_offloaded", "PipelineVault", "default_vault"]
