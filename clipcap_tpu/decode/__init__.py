from .engine import GenerationSettings, generate, trim_and_decode
from .beam import beam_search, beam_search_batched
from .serving import Request, ServingEngine
