import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from baram_spark.session import get_spark

    spark = get_spark(app_name="baram-tests", master="local[8]",
                      shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def work_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("baram_index")
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)
