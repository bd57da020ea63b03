"""Text tokenization.

Wraps the HuggingFace GPT-2 BPE tokenizer when available (reference:
gato_policy.py:57 uses `AutoTokenizer.from_pretrained('gpt2')`).  In
network-restricted environments where the tokenizer files cannot be fetched,
falls back to a deterministic byte-level tokenizer with the same vocab size so
the rest of the stack (tests, benchmarks) keeps identical static shapes.
"""

from __future__ import annotations

from typing import List, Optional

from neko_tpu.config import DEFAULT_TEXT_TOKENS

_CACHE: dict = {}


class ByteFallbackTokenizer:
    """Deterministic byte tokenizer with a GPT-2-sized vocab.

    Each UTF-8 byte maps to its own id; decoding is exact.  Only used when the
    real BPE files are unavailable — the token *ids* differ from GPT-2 BPE but
    every shape/dtype contract is identical.
    """

    vocab_size = DEFAULT_TEXT_TOKENS
    is_fallback = True
    eos_token_id = 50256

    def encode(self, text: str) -> List[int]:
        return list(text.encode("utf-8"))

    def decode(self, ids) -> str:
        return bytes(int(i) % 256 for i in ids).decode("utf-8", errors="replace")

    def __call__(self, texts, truncation=False, max_length=None, **kw):
        if isinstance(texts, str):
            texts = [texts]
        out = []
        for t in texts:
            ids = self.encode(t)
            if truncation and max_length is not None:
                ids = ids[:max_length]
            out.append(ids)
        return {"input_ids": out, "length": [len(i) for i in out]}


def get_text_tokenizer(model_name: str = "gpt2"):
    """Load the BPE tokenizer, caching per name; fall back to bytes offline."""
    if model_name in _CACHE:
        return _CACHE[model_name]
    tok = None
    try:
        import os

        from transformers import AutoTokenizer

        try:
            # avoid minutes of network retries in offline environments
            tok = AutoTokenizer.from_pretrained(model_name, local_files_only=True)
        except Exception:
            if os.environ.get("HF_HUB_OFFLINE") == "1":
                raise  # no cache and no network allowed: byte fallback
            tok = AutoTokenizer.from_pretrained(model_name)
        tok.is_fallback = False
    except Exception:
        tok = ByteFallbackTokenizer()
    _CACHE[model_name] = tok
    return tok
