from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_params, shard_batch, shard_opt_state, param_spec,
                   PARAM_RULES)
