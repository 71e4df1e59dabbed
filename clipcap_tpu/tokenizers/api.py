"""Tokenizer wrappers with the reference's exact `encode_text` semantics.

These mirror the uniform tokenizer surface of the reference's lms/ package:

- GPT2TokenizerWrapper.encode_text (reference lms/GPT2.py:28-44): when a
  max_token_length is given, it is *extended by one per requested special
  token* before truncation, then BOS is prepended / EOS appended — so a
  capped caption keeps its specials. bos == eos == the endoftext token.
- GPTJTokenizerWrapper.encode_text (reference lms/GPTJ.py:26-30): truncate
  only, no add_bos/add_eos parameters.
- T5TokenizerWrapper: truncate-only surface (reference lms/T0.py:26-30),
  backed by an HF `tokenizer.json` loaded from a local path (SentencePiece
  models require the pretrained asset either way).
- create_tokenizer: the type-string factory
  (reference create_dataset.py:242-255).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence

from .bpe import ByteLevelBPE

GPT2_EOT = "<|endoftext|>"


class GPT2TokenizerWrapper:
    def __init__(self, bpe: ByteLevelBPE, eot_token: str = GPT2_EOT):
        self.bpe = bpe
        if eot_token in bpe.encoder:
            self.bos_token_id = bpe.encoder[eot_token]
            self.eos_token_id = bpe.encoder[eot_token]
        else:  # tiny test vocabs
            self.bos_token_id = bpe.vocab_size - 1
            self.eos_token_id = bpe.vocab_size - 1
        self.all_special_ids = sorted({self.bos_token_id, self.eos_token_id})

    @classmethod
    def create(cls, vocab_dir: str) -> "GPT2TokenizerWrapper":
        return cls(ByteLevelBPE.from_pretrained_dir(vocab_dir))

    def encode(self, text: str) -> List[int]:
        return self.bpe.encode(text)

    def encode_text(
        self,
        text: str,
        max_token_length: Optional[int] = None,
        add_bos: bool = False,
        add_eos: bool = False,
    ) -> List[int]:
        if max_token_length is not None:
            if add_bos:
                max_token_length += 1
            if add_eos:
                max_token_length += 1
        tokens = self.encode(text)
        if max_token_length is not None:
            tokens = tokens[:max_token_length]
        if add_bos:
            tokens = [self.bos_token_id] + tokens
        if add_eos:
            tokens = tokens + [self.eos_token_id]
        return tokens

    def decode_tokens(self, tokens: Sequence[int]) -> str:
        return self.bpe.decode(tokens)

    @property
    def vocab_size(self) -> int:
        return self.bpe.vocab_size


class GPTJTokenizerWrapper(GPT2TokenizerWrapper):
    """GPT-J shares GPT-2's BPE; its encode_text is truncate-only."""

    def encode_text(self, text: str, max_token_length: Optional[int] = None) -> List[int]:  # type: ignore[override]
        tokens = self.encode(text)
        if max_token_length is not None:
            tokens = tokens[:max_token_length]
        return tokens


class T5TokenizerWrapper:
    """T5/T0 tokenizer backed by a local HF `tokenizer.json`.

    SentencePiece vocabularies are pretrained assets; pass the directory
    containing tokenizer.json (no network access is attempted).
    """

    def __init__(self, hf_tokenizer):
        self.tk = hf_tokenizer
        self.eos_token_id = self.tk.token_to_id("</s>")
        self.pad_token_id = self.tk.token_to_id("<pad>")
        self.bos_token_id = self.pad_token_id  # T5 decoder starts from pad
        specials = [self.eos_token_id, self.pad_token_id, self.tk.token_to_id("<unk>")]
        self.all_special_ids = sorted({s for s in specials if s is not None})

    @classmethod
    def create(cls, vocab_dir: str) -> "T5TokenizerWrapper":
        from tokenizers import Tokenizer

        path = Path(vocab_dir) / "tokenizer.json"
        if not path.exists():
            raise FileNotFoundError(
                f"T5 tokenizer needs a local {path} (SentencePiece assets are "
                "pretrained files; this framework does no network access)."
            )
        return cls(Tokenizer.from_file(str(path)))

    def encode(self, text: str) -> List[int]:
        return self.tk.encode(text).ids

    def encode_text(self, text: str, max_token_length: Optional[int] = None) -> List[int]:
        tokens = self.encode(text)
        if max_token_length is not None:
            tokens = tokens[:max_token_length]
        return tokens

    def decode_tokens(self, tokens: Sequence[int]) -> str:
        return self.tk.decode(list(int(t) for t in tokens))

    @property
    def vocab_size(self) -> int:
        return self.tk.get_vocab_size()


def create_tokenizer(tokenizer_model_type: str, vocab_dir: str):
    """Type-string -> tokenizer wrapper (reference create_dataset.py:242-255)."""
    t = tokenizer_model_type.lower()
    if t == "gpt2":
        return GPT2TokenizerWrapper.create(vocab_dir)
    if t in ("gptj", "gpt-j"):
        return GPTJTokenizerWrapper.create(vocab_dir)
    if t in ("t5", "t0"):
        return T5TokenizerWrapper.create(vocab_dir)
    raise ValueError(
        f"invalid tokenizer model type: {tokenizer_model_type!r} (expected gpt2/gpt-j/t0/t5)"
    )
