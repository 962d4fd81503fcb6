"""Registry-wide ANALYSIS smoke test.

Round-3 lesson: the sandbox moved from Spark 3 to Spark 4 between
rounds and a single events-read shim that no longer analyzed took out
19 of 91 queries, 25 tests, and the whole bench — and the first signal
was a crashed bench JSON, not a named test. This test touches
``.schema`` (analysis only, no execution) for every registry entry in
one pass, so the next environment shift surfaces as one red test
naming every affected query in seconds.

Exception: queries whose BUILD already runs Spark jobs (driver-side
query collect / KMeans fit) can't be analyzed without executing — they
are excluded here and covered by the parity/rows-only tests, keeping
this test's signal purely "does the plan analyze".
"""

from __future__ import annotations

import pytest

from datapipeline_template_spark.queries import load_all

REGISTRY = load_all()

# DataFrame construction itself executes jobs for these (see
# operators/similarity.py `_collect_query_side`, the IVF KMeans fit,
# and sketch.certified_topk's certification collect) — not
# analysis-only, so not this test's scope.
EXECUTES_AT_BUILD = {
    "ss04_cosine_topk_blas",
    "ss05_ivf_ann",
    "tx13_heavy_hitters_certified",
    "dd09_incremental_lsh",  # eager signature materialization
    "pk06_temperature_mix",  # stratum-count collect for the allocation
    "q26b_quantiles_multipass",  # iterative counting passes at build
}


@pytest.mark.parametrize("name", sorted(set(REGISTRY) - EXECUTES_AT_BUILD))
def test_query_analyzes(spark, sf_dir, name):
    # .schema forces Catalyst analysis (column resolution, type checks)
    # without triggering a job — fast enough to cover the full registry.
    schema = REGISTRY[name].fn(spark, sf_dir).schema
    assert len(schema.fields) > 0, f"{name}: empty schema"
