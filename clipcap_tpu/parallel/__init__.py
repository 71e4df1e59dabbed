from .sharding import param_shardings, shard_params, batch_shardings
