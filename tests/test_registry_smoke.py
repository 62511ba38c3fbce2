"""Build-and-run smoke over the ENTIRE registry.

Round-4 post-mortem (VERDICT r4 item 1): `asof_purchase_last_signup`
shipped with a NameError because the contract test only asserted
``callable(f)`` — nothing ever *called* a registered query outside the
driver's 50-row window, so a broken import on a historically-green query
stayed invisible.  This test closes that hole for good: every entry in
``queries()`` is invoked at sf0.001 and forced through analysis AND
execution (``limit(1).collect()``), so any NameError / missing import /
analysis error / kernel crash in any registered query turns into a red
test immediately, window membership notwithstanding.

``limit(1)`` keeps the execution cheap (most plans short-circuit after
one output row) while still running the physical plan end-to-end —
pandas kernels, joins, window functions and all.
"""

import os

import pytest

from semantic_cpp_spark import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"fixture dir {SF_DIR} missing"
)

_ALL = list(registry.queries())


@pytest.mark.parametrize("name", _ALL)
def test_query_builds_and_runs(spark, name):
    fn = registry.queries()[name]
    df = fn(spark, SF_DIR)
    # schema access forces full analysis; collect forces execution
    assert df.schema is not None
    df.limit(1).collect()
