import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from ngafid_cpat_spark.session import get_spark

    s = get_spark("ngafid-cpat-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
