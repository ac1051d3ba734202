from .mesh import (DATA_AXIS, MODEL_AXIS, data_axis_size, data_sharding,
                   initialize_multihost, make_mesh, replicated, shard_batch)
