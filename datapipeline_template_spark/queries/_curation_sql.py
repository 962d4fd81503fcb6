"""Shared DuckDB oracle fragments for the language-ID and Gopher-gate
stages — generated FROM the operator's own constants
(``operators.text.LANG_MARKERS`` and ``gopher_rules``'s defaults), so
the SQL can never desynchronize from the Spark operator it replays.
Composed by the tx03 oracle and the pipe09/pipe10/pipe11 flag fragment
(the `_classifier_sql.py` single-implementation rule, applied to the
other curation stages)."""

from __future__ import annotations

import inspect

from ..operators.text import LANG_MARKERS, gopher_rules

# The Gopher thresholds mirrored into SQL are the OPERATOR's own
# defaults — read from the signature so an operator re-threshold is
# automatically reflected here (and any structural change breaks the
# tests that compare these numbers, loudly).
_G = {
    k: v.default for k, v in inspect.signature(gopher_rules).parameters.items()
    if v.default is not inspect.Parameter.empty
}
GOPHER_MIN_WORDS: int = _G["min_words"]
GOPHER_MWL_LO, GOPHER_MWL_HI = _G["mean_word_len_bounds"]
GOPHER_ALPHA_PCT: int = _G["min_alpha_word_pct"]
GOPHER_MIN_STOPWORDS: int = _G["min_stopwords"]

ALL_MARKERS: tuple[str, ...] = tuple(
    m for ms in LANG_MARKERS.values() for m in ms
)


def _in_list(words: tuple[str, ...]) -> str:
    return "(" + ", ".join(f"'{w}'" for w in words) + ")"


def _hits(lang: str, text_col: str = "text", presplit: bool = False) -> str:
    toks = text_col if presplit else f"string_split({text_col},' ')"
    return (
        f"len(list_filter({toks}, "
        f"t -> t IN {_in_list(LANG_MARKERS[lang])}))"
    )


def langid_case_sql(text_col: str = "text", presplit: bool = False) -> str:
    """The tx03 language-ID CASE: marker-count argmax with the
    operator's deterministic priority (en>es>de>fr), 'und' when no
    markers hit — generated from LANG_MARKERS in priority order.
    Pass ``presplit=True`` when ``text_col`` is already a token array
    (the pipe09 fragment's ``w``) so the ~14 marker-hit expressions
    reuse one split instead of re-tokenizing per expression."""
    langs = list(LANG_MARKERS)
    branches = []
    for i, lang in enumerate(langs):
        later = langs[i + 1:]
        cond = f"{_hits(lang, text_col, presplit)} >= 1"
        if len(later) == 1:
            cond += (
                f"\n     AND {_hits(lang, text_col, presplit)} >= "
                f"{_hits(later[0], text_col, presplit)}"
            )
        elif later:
            others = ",\n                  ".join(
                _hits(x, text_col, presplit) for x in later
            )
            cond += (
                f"\n     AND {_hits(lang, text_col, presplit)} >=\n"
                f"         greatest({others})"
            )
        branches.append(f"    WHEN {cond}\n    THEN '{lang}'")
    body = "\n".join(branches)
    return f"""
  CASE
{body}
    ELSE 'und'
  END
"""


def gopher_pass_sql(w_col: str = "w") -> str:
    """Per-doc boolean: the four deterministic Gopher rules pipe09
    gates on (min words, mean word length bounds, alpha share,
    stopword floor — exact-integer cross-multiplied forms), over an
    already-split token-array column."""
    nw = f"CAST(len({w_col}) AS BIGINT)"
    wlen = f"CAST(list_sum(list_transform({w_col}, x -> len(x))) AS BIGINT)"
    nalpha = (
        f"CAST(len(list_filter({w_col}, x -> regexp_matches(x, '[a-zA-Z]')))"
        f" AS BIGINT)"
    )
    nstop = (
        f"CAST(len(list_filter({w_col}, x -> x IN {_in_list(ALL_MARKERS)}))"
        f" AS BIGINT)"
    )
    return (
        f"({nw} >= {GOPHER_MIN_WORDS}\n"
        f"     AND {GOPHER_MWL_LO} * {nw} <= {wlen}\n"
        f"     AND {wlen} <= {GOPHER_MWL_HI} * {nw}\n"
        f"     AND 100 * {nalpha} >= {GOPHER_ALPHA_PCT} * {nw}\n"
        f"     AND {nstop} >= {GOPHER_MIN_STOPWORDS})"
    )
