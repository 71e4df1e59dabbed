from .autoclip import AutoClipState, autoclip_init, autoclip_update
from .optim import make_optimizer, linear_warmup_schedule
from .train_step import TrainState, create_train_state, make_train_step
