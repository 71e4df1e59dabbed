"""Byte-level BPE (GPT-2 family) — pure Python, no network, no torch.

The reference uses HF's GPT2Tokenizer (Rust internals) via
`from_pretrained` (reference lms/GPT2.py:24). Here the algorithm is
implemented directly and vocabularies load from local `vocab.json` +
`merges.txt` files, so the framework is self-contained on an air-gapped
TPU host. The encoding algorithm (bytes->unicode table, regex pre-split,
lowest-rank merge loop) follows the published GPT-2 BPE description.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

import regex as re

# GPT-2's pre-tokenization pattern: contractions, letter runs, number runs,
# punctuation runs, trailing-space handling.
GPT2_SPLIT_PATTERN = (
    r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
)


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Invertible byte -> printable-unicode map (the GPT-2 trick that makes
    every byte sequence a valid token string)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class ByteLevelBPE:
    """GPT-2-style byte-level BPE encoder/decoder."""

    def __init__(
        self,
        vocab: Dict[str, int],
        merges: List[Tuple[str, str]],
        split_pattern: str = GPT2_SPLIT_PATTERN,
    ):
        self.encoder = dict(vocab)
        self.decoder = {v: k for k, v in vocab.items()}
        self.bpe_ranks = {pair: i for i, pair in enumerate(merges)}
        self.pat = re.compile(split_pattern)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self._bpe_cache: Dict[str, str] = {}

    # ---- construction -------------------------------------------------------

    @classmethod
    def from_files(cls, vocab_file: str, merges_file: str) -> "ByteLevelBPE":
        with open(vocab_file, encoding="utf-8") as f:
            vocab = json.load(f)
        merges: List[Tuple[str, str]] = []
        with open(merges_file, encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#version"):
                    continue
                a, b = line.split()
                merges.append((a, b))
        return cls(vocab, merges)

    @classmethod
    def from_pretrained_dir(cls, path: str) -> "ByteLevelBPE":
        p = Path(path)
        return cls.from_files(str(p / "vocab.json"), str(p / "merges.txt"))

    # ---- core BPE ------------------------------------------------------------

    def _bpe(self, token: str) -> str:
        if token in self._bpe_cache:
            return self._bpe_cache[token]
        word = tuple(token)
        if len(word) < 2:
            self._bpe_cache[token] = token
            return token
        pairs = _get_pairs(word)
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._bpe_cache[token] = out
        return out

    # ---- public API ------------------------------------------------------------

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for piece in self.pat.findall(text):
            mapped = "".join(self.byte_encoder[b] for b in piece.encode("utf-8"))
            for sub in self._bpe(mapped).split(" "):
                ids.append(self.encoder[sub])
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids if int(i) in self.decoder)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)
