"""Unigram-LM tokenizer oracle fragments — a standalone module (the
_kmeans_sql/_bm25_sql precedent) generating the DuckDB replay of
operators/text.py's deterministic hard-EM trainer (unigram_train) so
tx28 (train) and tx29 (encode) verify the SAME unrolled trajectory.

Every hard-EM round is unrolled (the tx20 merge-round pattern): one
cost derivation, a Viterbi DP unrolled position-by-position to the
pinned max word length, a back-pointer table (MIN(l) over achieving
edges — the engine's smallest-l tie-break), a read-back walk unrolled
to the same bound, and the recount with the char floor. Re-referenced
CTEs are MATERIALIZED (the tx20b 2^rounds-inlining lesson)."""

from __future__ import annotations

from ._bm25_sql import _milli_log2_sql


def _round_ctes(tag: str, src: str, lmax: int, maxw: int) -> str:
    """One hard-EM round under counts CTE ``src``: emits t{tag}/k{tag}
    (total + millibit costs), dp{tag}_0..{maxw} (best-cost table built
    position by position), bp{tag} (smallest achieving piece length per
    position), sg{tag}_0..{maxw} (read-back walk; steps 1.. emit
    pieces), em{tag} (all emissions with 0-based start pos) and
    c{tag} (recounted pieces: char floor 1, zero-count non-chars
    dropped). Requires the caller's ``wv`` (word, freq), ``pieces``
    (word, freq, st, en, p) and ``chars`` (p) CTEs."""
    ml = _milli_log2_sql
    parts = [
        f""", t{tag} AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM {src})
, k{tag} AS MATERIALIZED (
  SELECT piece, CAST({ml('t.t')} - {ml('c.cnt')} AS BIGINT) AS cost_mb
  FROM {src} c, t{tag} t
)
, dp{tag}_0 AS (
  SELECT word, CAST(0 AS BIGINT) AS pos, CAST(0 AS BIGINT) AS best FROM wv
)"""
    ]
    for i in range(1, maxw + 1):
        parts.append(f""", s{tag}_{i} AS (
  SELECT pc.word, CAST({i} AS BIGINT) AS pos,
         MIN(d.best + k.cost_mb) AS best
  FROM pieces pc
  JOIN dp{tag}_{i - 1} d ON d.word = pc.word AND d.pos = pc.st
  JOIN k{tag} k ON k.piece = pc.p
  WHERE pc.en = {i}
  GROUP BY pc.word
)
, dp{tag}_{i} AS MATERIALIZED (
  SELECT * FROM dp{tag}_{i - 1} UNION ALL SELECT * FROM s{tag}_{i}
)""")
    parts.append(f""", bp{tag} AS MATERIALIZED (
  SELECT word, pos, MIN(l) AS bp FROM (
    SELECT pc.word, pc.en AS pos, pc.en - pc.st AS l
    FROM pieces pc
    JOIN dp{tag}_{maxw} d0 ON d0.word = pc.word AND d0.pos = pc.st
    JOIN dp{tag}_{maxw} d1 ON d1.word = pc.word AND d1.pos = pc.en
    JOIN k{tag} k ON k.piece = pc.p
    WHERE d0.best + k.cost_mb = d1.best
  ) GROUP BY word, pos
)
, sg{tag}_0 AS (
  SELECT word, freq, CAST(length(word) AS BIGINT) AS pos,
         '' AS p FROM wv
)""")
    for t in range(1, maxw + 1):
        parts.append(f""", sg{tag}_{t} AS MATERIALIZED (
  SELECT s.word, s.freq, s.pos - b.bp AS pos,
         substr(s.word, CAST(s.pos - b.bp + 1 AS INT), CAST(b.bp AS INT)) AS p
  FROM sg{tag}_{t - 1} s JOIN bp{tag} b ON b.word = s.word AND b.pos = s.pos
  WHERE s.pos > 0
)""")
    emits = " UNION ALL ".join(
        f"SELECT word, freq, pos, p FROM sg{tag}_{t}" for t in range(1, maxw + 1)
    )
    parts.append(f""", em{tag} AS MATERIALIZED ({emits})
, raw{tag} AS (
  SELECT p AS piece, CAST(SUM(freq) AS BIGINT) AS cnt FROM em{tag} GROUP BY p
)
, c{tag} AS MATERIALIZED (
  SELECT ch.p AS piece,
         CAST(GREATEST(COALESCE(r2.cnt, 0), 1) AS BIGINT) AS cnt
  FROM chars ch LEFT JOIN raw{tag} r2 ON r2.piece = ch.p
  UNION ALL
  SELECT piece, cnt FROM raw{tag} WHERE length(piece) > 1
)""")
    return "".join(parts)


def unigram_ctes(
    lmax: int,
    rounds: int,
    vocab_size: int,
    maxw: int,
    source: str = "documents",
) -> str:
    """The full unigram-LM training replay, ending in ``cF`` (final
    counts) and ``fin`` (piece, cnt, cost_mb — the trained model).
    ``source`` names the (text) relation words come from (the
    _tx20_ctes parameter convention). The caller must prepend
    ``WITH `` and can chain further round blocks (tx29 encodes under
    ``fin`` via one more ``_round_ctes``)."""
    ml = _milli_log2_sql
    # The word CTE is named ``uw`` (not ``w``) so this fragment
    # composes with _tx20_ctes — whose head CTE is ``w`` — in ONE
    # WITH (tx30's tokenizer-comparison oracle needs both chains).
    head = f"""uw AS (
  SELECT lower(t) AS word FROM (
    SELECT unnest(regexp_extract_all(text, '[a-zA-Z]+', 0)) AS t
    FROM {source})
), wv AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM uw GROUP BY word
), pieces AS MATERIALIZED (
  SELECT word, freq, CAST(i - 1 AS BIGINT) AS st,
         CAST(i - 1 + l AS BIGINT) AS en, substr(word, i, l) AS p
  FROM wv,
       UNNEST(range(1, length(word) + 1)) AS ti(i),
       UNNEST(range(1, least({lmax}, length(word) - i + 1) + 1)) AS tl(l)
), chars AS MATERIALIZED (
  SELECT DISTINCT p FROM pieces WHERE length(p) = 1
), c_seed AS MATERIALIZED (
  SELECT p AS piece, CAST(SUM(freq) AS BIGINT) AS cnt
  FROM pieces GROUP BY p
)"""
    blocks = []
    src = "c_seed"
    for r in range(rounds):
        blocks.append(_round_ctes(f"r{r}", src, lmax, maxw))
        src = f"cr{r}"
    blocks.append(f""", kept AS MATERIALIZED (
  SELECT piece FROM (
    SELECT piece FROM {src} ORDER BY cnt DESC, piece LIMIT {vocab_size})
  UNION
  SELECT p FROM chars
), cpr AS MATERIALIZED (
  SELECT c.piece, c.cnt FROM {src} c JOIN kept USING (piece)
)""")
    blocks.append(_round_ctes("F", "cpr", lmax, maxw))
    blocks.append(f""", tfin AS (SELECT CAST(SUM(cnt) AS BIGINT) AS t FROM cF)
, fin AS MATERIALIZED (
  SELECT piece, cnt, CAST({ml('t.t')} - {ml('c.cnt')} AS BIGINT) AS cost_mb
  FROM cF c, tfin t
)""")
    return head + "".join(blocks)
