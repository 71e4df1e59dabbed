from .dtypes import DTypePolicy, default_policy
from .mesh import MeshSpec, make_mesh, data_sharding, replicated
from .config import (
    MapperConfig,
    GPT2Config,
    GPTJConfig,
    T5Config,
    ViTConfig,
    BlipTextConfig,
    CaptionerConfig,
    TrainConfig,
)
