"""Shared deterministic constants for the text/dedup pipeline.

Both the Spark implementations and the DuckDB oracle SQL are generated from
THESE constants, so the two sides cannot drift. All hashing is integer
arithmetic bounded to < 2^51 (exact in both engines, no overflow).
"""

from __future__ import annotations

# Stopwords for the quality score (fixed vocabulary of the synthetic docs)
STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]

# Tiny per-language lexicons for the n-gram/stopword language-ID heuristic
LANG_LEXICONS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit"],
    "en": ["the", "a", "and", "is", "of", "this", "that"],
    "es": ["el", "la", "los", "y", "es", "con", "para"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans"],
}

# MinHash parameters: NUM_PERM permutations in BANDS bands of ROWS rows
MINHASH_PRIME = 999_999_937           # prime < 2^30
NUM_PERM = 16
BANDS = 4
ROWS_PER_BAND = NUM_PERM // BANDS
# deterministic odd multipliers/offsets (seed-free, reproducible anywhere)
MINHASH_A = [2 * i * i + 3 * i + 5 for i in range(1, NUM_PERM + 1)]
MINHASH_B = [7 * i * i + 11 * i + 13 for i in range(1, NUM_PERM + 1)]

# SimHash: 32 per-bit hash functions over token ids
SIMHASH_BITS = 32
SIMHASH_C = [4 * b * b + 7 * b + 17 for b in range(1, SIMHASH_BITS + 1)]
SIMHASH_D = [9 * b * b + 5 * b + 3 for b in range(1, SIMHASH_BITS + 1)]

# Rolling-hash fingerprint (3-gram polynomial, winnowing-style min)
FP_BASE = 31
FP_MOD = 1_000_003

SHINGLE_K = 3  # token n-gram size for Jaccard / MinHash


def params_values_sql(name_a: str, name_b: str, a: list[int], b: list[int]) -> str:
    """Inline VALUES table '(i, a, b)' shared by the DuckDB oracle."""
    rows = ", ".join(f"({i}, {ai}, {bi})" for i, (ai, bi) in enumerate(zip(a, b)))
    return f"(VALUES {rows}) AS params(i, {name_a}, {name_b})"
