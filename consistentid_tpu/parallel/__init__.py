from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding, make_mesh, replicated, shard_batch
