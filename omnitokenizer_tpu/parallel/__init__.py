from .mesh import data_mesh, shard_batch, replicate
from .tp import (gpt_param_specs, shard_params, sharded_opt_init,
                 sp_pixel_spec, tp_mesh)
from .pp import make_pp_lm_loss, pp_mesh, shard_stacked, stack_block_params
