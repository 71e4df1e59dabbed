from .engine import GenerationSettings, generate, trim_and_decode
from .beam import beam_search
from .serving import Request, ServingEngine
