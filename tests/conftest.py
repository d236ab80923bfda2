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


def stats_dir(index_dir: str, name: str) -> str:
    """Resolve a versioned stats table (v_K subdirs) to its newest version."""
    import os
    import re as _re

    base = f"{index_dir}/{name}"
    if os.path.exists(base):
        vs = [int(m.group(1)) for d in os.listdir(base)
              if (m := _re.match(r"v_(\d+)$", d))]
        if vs:
            return f"{base}/v_{max(vs)}"
    return base
