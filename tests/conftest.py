import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    import tempfile

    from semantic_cpp_spark.session import get_spark

    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            # static conf — must be set at session creation (bucketed-table
            # tests write managed tables)
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="semwh_"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    yield s
    # Flush range-strategy persists + density-probe memos at the session
    # boundary (advisor r2: release_ordinal_caches existed but nothing
    # called it by default).
    from semantic_cpp_spark.indexing import release_ordinal_caches

    release_ordinal_caches()
