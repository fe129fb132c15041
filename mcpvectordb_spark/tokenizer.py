"""Deterministic tokenizers.

The reference counts tokens with the HF nomic tokenizer
(/root/reference/src/mcpvectordb/chunker.py:49-52); the chunking *algorithm*
is tokenizer-agnostic, so in this engine the token counter is pluggable.
Two deterministic counters are provided (FIXTURES.md rule 2):

- ``ws_token_count``  — whitespace-split word count (the fixture default).
- ``bpe_ish_tokens``  — a BPE-flavoured regex tokenizer: splits words,
  numbers, and individual punctuation, then sub-splits long words into
  4-char pieces, approximating subword token inflation.
"""

from __future__ import annotations

import re

_WORD_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")


def ws_tokens(text: str) -> list[str]:
    return text.split()


def ws_token_count(text: str) -> int:
    return len(text.split())


def bpe_ish_tokens(text: str, piece: int = 4) -> list[str]:
    """Regex word/number/punct split, then fixed-width subword pieces."""
    out: list[str] = []
    for tok in _WORD_RE.findall(text):
        if len(tok) <= piece or not tok.isalpha():
            out.append(tok)
        else:
            out.extend(tok[i : i + piece] for i in range(0, len(tok), piece))
    return out


def bpe_ish_token_count(text: str) -> int:
    return len(bpe_ish_tokens(text))
