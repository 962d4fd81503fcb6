"""Source connectors: batch and streaming file readers with the
schema-inference/evolution shim that replaces Databricks Auto Loader
(reference R2–R4; SURVEY.md §7.4)."""
