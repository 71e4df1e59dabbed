from .ptb_tokenizer import ptb_tokenize
from .scoring import generate_scores, generate_scores_full
from .clip_scoring import ClipScoring
from .validator import CaptionValidator, CocoCaptionValidator
