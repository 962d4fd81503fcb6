"""Pipeline plans: the explicit dataset DAG and its runner — our
replacement for the SDP runtime's decorator-registration graph
(`/root/reference/src/sdp_etl/transformations/01_bronze_ingestion.py:68-74`)."""
