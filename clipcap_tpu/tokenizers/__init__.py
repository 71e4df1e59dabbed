from .bpe import ByteLevelBPE
from .api import (
    GPT2TokenizerWrapper,
    GPTJTokenizerWrapper,
    T5TokenizerWrapper,
    create_tokenizer,
)
