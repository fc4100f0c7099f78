from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_params, shard_batch, param_spec, PARAM_RULES)
