"""Text-analysis operators (X11): token stats, quality scoring,
language identification, document fingerprinting.

All pure `pyspark.sql.functions` array/string expressions — vectorized
JVM execution, no Python in the hot path. At 100 TB these are narrow
per-row maps: no shuffle at all until a downstream aggregate.

The hashes/scores are engine-portable (polynomial hashing, exact
rational arithmetic) so the DuckDB oracle can replay them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions import poly_hash

__all__ = [
    "tokenize",
    "token_count",
    "quality_score",
    "language_id",
    "fingerprint",
    "LANG_MARKERS",
]


def tokenize(text: Column | str) -> Column:
    """Whitespace tokenizer (documents.text is space-separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text)).cast("long")


def quality_score(text: Column | str, n_chars: Column | str) -> Column:
    """Heuristic quality in [0,1]: long-enough docs with mid-length
    words score high. Pure rational arithmetic of exact ints:
    score = min(tokens,200)/200 * (1 - |avg_word_len - 5| / 10),
    clamped at 0. (The shape mirrors common LLM-corpus length/word
    heuristics, e.g. Gopher rules.)"""
    nc = (F.col(n_chars) if isinstance(n_chars, str) else n_chars).cast("double")
    toks = token_count(text).cast("double")
    avg_word = nc / toks
    length_part = F.least(toks, F.lit(200.0)) / F.lit(200.0)
    word_part = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(avg_word - F.lit(5.0)) / F.lit(10.0)
    )
    return length_part * word_part


# Marker stopwords per language; fixed priority order breaks ties.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "los", "que", "de"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "les", "et", "est", "une"),
}


def language_id(text: Column | str) -> Column:
    """N-gram/stopword-marker language ID: count marker hits per
    language, argmax with deterministic priority (en>es>de>fr), 'und'
    when no markers hit. Token-set membership stays in codegen."""
    tokens = tokenize(text)

    def _member(markers: tuple[str, ...]):
        return lambda t: t.isin(*markers)

    counts = {
        lang: F.size(F.filter(tokens, _member(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    order = list(LANG_MARKERS)
    best = F.lit("und")
    best_cnt = F.lit(0)
    # Iterate in reverse priority so earlier languages win ties (>).
    for lang in reversed(order):
        cnt = counts[lang]
        best = F.when(cnt >= F.lit(1), F.when(cnt >= best_cnt, F.lit(lang)).otherwise(best)).otherwise(best)
        best_cnt = F.greatest(best_cnt, cnt)
    return best


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: polynomial rolling hash of
    the full text, mod 1e9+7 (functions.poly_hash)."""
    return poly_hash(text)
