from __future__ import annotations

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from feature_store_healthcare_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("fshs-tests", master="local[8]", shuffle_partitions=8)
    # register the package zip on Python workers: Arrow kernels that
    # reference package module functions (codecs, multimodal, minhash)
    # otherwise only import when pytest happens to run from the repo
    # root (round 13: 9 tests failed from a non-repo cwd)
    from feature_store_healthcare_spark.queries import ensure_worker_imports

    ensure_worker_imports(s)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
