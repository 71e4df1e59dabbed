from .sharding import param_shardings, shard_params, batch_shardings
from .pp import make_gpt2_pp_apply, pp_param_shardings, PIPE_AXIS
from .sp import make_vit_sp_apply, ring_attention_shard
from .ep import expert_constraint, moe_param_shardings
