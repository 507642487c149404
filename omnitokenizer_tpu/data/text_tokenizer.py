"""CLIP-style byte-BPE text tokenizer (for 'text' conditioning and the
CoinRun caption pipeline).

Reference: /root/reference/OmniTokenizer/coinrun/tokenizer.py (the standard
CLIP SimpleTokenizer).  Implemented from the published BPE algorithm; the
merge table is read from a user-supplied vocab file (the reference ships one
at coinrun/language_model/bpe_simple_vocab_16e6.txt[.gz]).
Vocabulary size: 49408 (matching lm_transformer.py:125's Identity cond).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import re
from typing import Dict, List, Optional, Tuple

REFERENCE_VOCAB = ("/root/reference/OmniTokenizer/coinrun/language_model/"
                   "bpe_simple_vocab_16e6.txt")


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte <-> printable-unicode map (standard GPT-2/CLIP table)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word: Tuple[str, ...]):
    return {(a, b) for a, b in zip(word, word[1:])}


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text.strip()).lower()


class SimpleTokenizer:
    def __init__(self, bpe_path: Optional[str] = None):
        bpe_path = bpe_path or REFERENCE_VOCAB
        if bpe_path.endswith(".gz"):
            with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
                merges = f.read().split("\n")
        else:
            with open(bpe_path, encoding="utf-8") as f:
                merges = f.read().split("\n")
        merges = merges[1:49152 - 256 - 2 + 1]
        merges = [tuple(m.split()) for m in merges if m]

        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        vocab = list(self.byte_encoder.values())
        vocab += [v + "</w>" for v in vocab]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {t: i for i, t in enumerate(vocab)}
        self.decoder = {i: t for t, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        # \p{L}/\p{N} classes need the regex module; stdlib `re` fallback
        # covers ASCII which is all the caption pipeline produces
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
            r"[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+",
            re.IGNORECASE)

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
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
                if word[i] == first and i < len(word) - 1 and word[i + 1] == second:
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
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        text = _clean(text)
        ids: List[int] = []
        for token in re.findall(self.pat, text):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def decode(self, ids) -> str:
        text = "".join(self.decoder[int(i)] for i in ids)
        raw = bytearray(self.byte_decoder[c] for c in text)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, text: str, context_length: int = 77,
                 pad_id: int = 0) -> List[int]:
        """Encode with sot/eot wrapping, truncate/pad to context_length."""
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        ids = [sot] + self.encode(text)[: context_length - 2] + [eot]
        return ids + [pad_id] * (context_length - len(ids))

    def tokenize(self, text: str, context_length: int = 256,
                 truncate_text: bool = True) -> List[int]:
        """Reference tokenize semantics (coinrun/tokenizer.py:139-158):
        [sot] + bpe + [eot], zero-padded; overflow truncates the WRAPPED
        sequence and force-sets the last slot to eot (vs __call__, which
        truncates before wrapping)."""
        sot = self.encoder["<|startoftext|>"]
        eot = self.encoder["<|endoftext|>"]
        ids = [sot] + self.encode(text) + [eot]
        if len(ids) > context_length:
            if not truncate_text:
                raise RuntimeError(
                    f"input is too long for context length {context_length}")
            ids = ids[:context_length]
            ids[-1] = eot
        return ids + [0] * (context_length - len(ids))
