from .tokenize import TOKEN_SPLIT_REGEX, tokenize, words_from
from .vectors import cosine_similarity, dot, l2_norm
from .hashing import minhash_signature_expr, ngram_shingles, simhash_expr

__all__ = [
    "TOKEN_SPLIT_REGEX",
    "tokenize",
    "words_from",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "ngram_shingles",
    "minhash_signature_expr",
    "simhash_expr",
]
