"""CLIP text tokenisation (host-side).

The reference tokenises instructions with the CLIP package's BPE tokenizer
(`preprocess_text_calvin`, data_utils.py:181-183; `clip.tokenize` with
truncate=True producing (N, 77) int32). This is a standalone implementation
of the same byte-level BPE; it needs the standard CLIP vocabulary file
(`bpe_simple_vocab_16e6.txt.gz`) which ships with every CLIP install —
point `CLIP_BPE_PATH` or place it under checkpoints/clip/.

When no vocabulary is available (hermetic tests), `HashTokenizer` provides a
deterministic stand-in with the same (N, 77) contract and start/end token
ids, so the full pipeline runs; swap in the real vocab for checkpoint-parity
evaluation.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import List, Sequence

import numpy as np

CONTEXT_LENGTH = 77
SOT = 49406  # <|startoftext|>
EOT = 49407  # <|endoftext|>

_VOCAB_CANDIDATES = (
    os.environ.get("CLIP_BPE_PATH", ""),
    "checkpoints/clip/bpe_simple_vocab_16e6.txt.gz",
    os.path.expanduser("~/.cache/clip/bpe_simple_vocab_16e6.txt.gz"),
)


@functools.lru_cache()
def bytes_to_unicode():
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _basic_clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text).strip().lower()


class ClipBPETokenizer:
    """Byte-level BPE with the CLIP merge table and <|startoftext|> framing."""

    def __init__(self, bpe_path: str):
        merges = gzip.open(bpe_path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        vocab = list(bytes_to_unicode().values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.cache = {}
        self.pattern = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+"
            if False else
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE,
        )

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1e10))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in re.findall(self.pattern, _basic_clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(token).split(" "))
        return ids

    def __call__(self, texts: Sequence[str], context: int = CONTEXT_LENGTH,
                 truncate: bool = True) -> np.ndarray:
        out = np.zeros((len(texts), context), np.int32)
        for i, text in enumerate(texts):
            ids = [SOT] + self.encode(text) + [EOT]
            if len(ids) > context:
                if not truncate:
                    raise ValueError(f"text too long: {text!r}")
                ids = ids[:context]
                ids[-1] = EOT
            out[i, : len(ids)] = ids
        return out


class HashTokenizer:
    """Deterministic stand-in with the CLIP (N,77)/SOT/EOT contract."""

    def __call__(self, texts: Sequence[str], context: int = CONTEXT_LENGTH,
                 truncate: bool = True) -> np.ndarray:
        out = np.zeros((len(texts), context), np.int32)
        for i, text in enumerate(texts):
            words = _basic_clean(text).split(" ")[: context - 2]
            ids = [SOT] + [hash(w) % 49000 + 300 for w in words] + [EOT]
            out[i, : len(ids)] = ids
        return out


def get_tokenizer(require_bpe: bool = False):
    """The CLIP BPE tokenizer when a vocab file is available, else the
    hermetic HashTokenizer stand-in.

    `require_bpe=True` hard-fails instead of falling back — eval paths
    MUST use it: a silent hash fallback would garbage every instruction
    embedding while still producing plausible-looking rollouts."""
    for path in _VOCAB_CANDIDATES:
        if path and os.path.exists(path):
            return ClipBPETokenizer(path)
    if require_bpe:
        raise FileNotFoundError(
            "CLIP BPE vocab not found (searched: "
            f"{[p for p in _VOCAB_CANDIDATES if p]}). Download "
            "bpe_simple_vocab_16e6.txt.gz (openai/CLIP) and set "
            "CLIP_BPE_PATH or place it at "
            "checkpoints/clip/bpe_simple_vocab_16e6.txt.gz. Refusing to "
            "fall back to the test-only HashTokenizer in an eval path.")
    return HashTokenizer()
