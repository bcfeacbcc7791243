from __future__ import annotations

import pytest

from geodiff_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "geodiff_spark_tests",
        cores=8,
        shuffle_partitions=8,
        extra_confs={
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="gds_wh_"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    yield s


def assert_df_equal(a, b, key=None):
    """Order-insensitive DataFrame equality on collected rows."""
    ka = sorted(map(repr, a.collect()))
    kb = sorted(map(repr, b.collect()))
    assert ka == kb, f"\nonly-left={set(ka) - set(kb)}\nonly-right={set(kb) - set(ka)}"
