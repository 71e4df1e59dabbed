"""Byte-level BPE parity vs HF GPT2Tokenizer on a tiny offline vocab,
plus the reference encode_text quirks (lms/GPT2.py:28-44).
"""

import json

import pytest

from clipcap_tpu.tokenizers import GPT2TokenizerWrapper, GPTJTokenizerWrapper
from clipcap_tpu.tokenizers.bpe import ByteLevelBPE, bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    """Build a small but genuine byte-level BPE vocab."""
    d = tmp_path_factory.mktemp("vocab")
    base = list(bytes_to_unicode().values())
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġ", "a"), ("i", "n"), ("r", "e"),
        ("o", "n"), ("Ġt", "he"), ("e", "r"), ("Ġ", "s"), ("a", "t"),
        ("Ġ", "w"), ("Ġ", "o"), ("e", "n"), ("Ġa", "t"), ("o", "r"),
        ("Ġc", "at"), ("Ġ", "c"), ("i", "t"), ("n", "g"), ("d", "o"),
        ("do", "g"), ("Ġ", "dog"), (".", "."),
    ]
    # merge results must exist in the vocab
    tokens = base + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(d)


SENTENCES = [
    "the cat sat on the dog.",
    "A man riding a wave on top of a surfboard.",
    "  weird   spacing\tand\nnewlines ",
    "unicode: caffè, 東京, emoji 🎉 end",
    "numbers 12345 and punct!?;:...",
    "",
]


def test_encode_decode_matches_hf(vocab_dir):
    from transformers import GPT2Tokenizer as HFGPT2Tokenizer

    hf = HFGPT2Tokenizer(
        vocab_file=f"{vocab_dir}/vocab.json", merges_file=f"{vocab_dir}/merges.txt"
    )
    ours = ByteLevelBPE.from_pretrained_dir(vocab_dir)
    for s in SENTENCES:
        expected = hf.encode(s)
        got = ours.encode(s)
        assert got == expected, f"mismatch on {s!r}: {got} vs {expected}"
        if s:
            assert ours.decode(got) == hf.decode(expected)


def test_encode_text_bos_eos_maxlen_quirk(vocab_dir):
    """max_token_length is extended by 1 per special (reference GPT2.py:29-34)."""
    tok = GPT2TokenizerWrapper.create(vocab_dir)
    text = "the cat sat on the dog."
    plain = tok.encode_text(text)
    assert len(plain) > 4

    capped = tok.encode_text(text, max_token_length=3)
    assert capped == plain[:3]

    both = tok.encode_text(text, max_token_length=3, add_bos=True, add_eos=True)
    # cap extended to 5, then bos/eos wrapped
    assert both == [tok.bos_token_id] + plain[:5] + [tok.eos_token_id]
    assert len(both) == 7


def test_gptj_tokenizer_truncate_only(vocab_dir):
    tok = GPTJTokenizerWrapper.create(vocab_dir)
    text = "the cat sat on the dog."
    assert tok.encode_text(text, max_token_length=2) == tok.encode(text)[:2]


def test_decode_tokens_roundtrip(vocab_dir):
    tok = GPT2TokenizerWrapper.create(vocab_dir)
    text = "the cat sat."
    assert tok.decode_tokens(tok.encode_text(text)) == text
