from .sharding import param_shardings, shard_params, batch_shardings
from .pp import make_gpt2_pp_apply, pp_param_shardings, PIPE_AXIS
