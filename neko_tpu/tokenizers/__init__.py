from neko_tpu.tokenizers.continuous import (
    ContinuousTokenizer,
    decode,
    decode_np,
    encode,
    encode_np,
    mu_law,
    mu_law_np,
)
from neko_tpu.tokenizers.text import ByteFallbackTokenizer, get_text_tokenizer

__all__ = [
    "ContinuousTokenizer",
    "mu_law",
    "mu_law_np",
    "encode",
    "encode_np",
    "decode",
    "decode_np",
    "get_text_tokenizer",
    "ByteFallbackTokenizer",
]
