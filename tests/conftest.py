from __future__ import annotations

import pytest

from extractthinker_spark.session import get_spark


import os


@pytest.fixture(scope="session")
def spark():
    # TEST_MASTER/TEST_SHUFFLE let CI re-run the suite at different
    # parallelism — results must be invariant (span order comes from
    # data, never partition order).
    s = get_spark(
        "extractthinker-tests",
        master=os.environ.get("TEST_MASTER", "local[4]"),
        shuffle_partitions=int(os.environ.get("TEST_SHUFFLE", "8")),
    )
    yield s
    s.stop()
