from .mesh import data_mesh, shard_batch, replicate
from .tp import (gpt_param_specs, shard_params, sharded_opt_init,
                 sp_pixel_spec, tp_mesh)
