"""Shared DuckDB oracle fragment for the log-odds classifier
(tx19, and the classifier stage inside pipe09/pipe10).

One fragment, three composing oracles — the same
single-implementation rule `_kmeans_sql.py` establishes for the
k-means family: a threshold or tokenization change lands in every
oracle at once instead of silently desynchronizing the funnel from
the standalone classifier query.
"""

from __future__ import annotations


def classifier_ctes(pos_sources: tuple[str, ...] = ("src0", "src1")) -> str:
    """CTE chain ending in ``sc(doc_id, score)`` — the exact-integer
    log-odds-sign train+score loop over ``documents``. Rate compares
    run in DECIMAL(19,0) products (exact past int64 at web-scale
    token counts), mirroring ``operators/text.logodds_classifier``."""
    dec = "DECIMAL(19,0)"
    lhs = f"CAST(pos_cnt AS {dec}) * CAST(tn AS {dec})"
    rhs = f"CAST(neg_cnt AS {dec}) * CAST(tp AS {dec})"
    # Explicit SQL list — repr() of a 1-tuple emits Python's trailing
    # comma ("('src0',)"), a SQL syntax error.
    in_list = "(" + ", ".join(f"'{s}'" for s in pos_sources) + ")"
    return f"""toks AS (
  SELECT doc_id, source IN {in_list} AS pos,
         unnest(string_split(text, ' ')) AS tok
  FROM documents
), vocab AS (
  SELECT tok,
         SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos_cnt,
         SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS neg_cnt
  FROM toks GROUP BY tok
), tot AS (
  SELECT SUM(pos_cnt) AS tp, SUM(neg_cnt) AS tn FROM vocab
), wt AS (
  SELECT tok,
         CASE WHEN {lhs} > {rhs} THEN 1
              WHEN {lhs} < {rhs} THEN -1 ELSE 0 END AS w
  FROM vocab, tot
), dt AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
), sc AS (
  SELECT doc_id, SUM(c * w) AS score FROM dt JOIN wt USING (tok)
  GROUP BY doc_id
)"""
