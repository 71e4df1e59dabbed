from . import mapper
from . import gpt2
