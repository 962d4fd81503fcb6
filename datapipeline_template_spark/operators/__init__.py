"""Engine operators.

Each module re-expresses one capability family of the reference
(`/root/reference/src/sdp_etl/transformations/*`) as idiomatic
DataFrame transformations, plus the LLM-data-pipeline extensions:

- projection   — int→bigint widening, audit columns, renames (R12/R13/R15)
- dedup        — keep-latest CDC dedup (R19) + exact/fuzzy dedup (X9/X10)
- expectations — data-quality expect_all_or_drop with metrics (R18)
- cdc          — soft-delete semantics + active views (R17, R11)
- layout       — clustering fallback, file-size hygiene (R23/R24)
- text         — language-ID, quality scoring, tokens, fingerprints (X11)
- similarity   — cosine top-k, LSH-bucketed ANN (X10/X12)
- multimodal   — binary media column plumbing (X12)
"""
