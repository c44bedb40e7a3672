from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rental_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Two-tier gate: `pytest -m quick` runs one fast module per operator
# family (~6 min) for mid-round iteration; the FULL suite (~45 min)
# remains the final pre-commit gate. Module-level selection keeps the
# tier maintainable — a new test lands in the tier iff its module does.
QUICK_MODULES = {
    "test_plans.py",              # plan gates: no row UDFs, broadcasts, registry binding
    "test_asof.py",
    "test_rangejoin.py",
    "test_observe.py",
    "test_sampling_urls.py",
    "test_extract.py",
    "test_merge.py",              # CDC upsert core
    "test_training_ops.py",       # dedup/ANN/textstats/multimodal smoke
    "test_operator_hardening5.py",  # newest edge-case pins
    "test_codec_property.py",     # BMP codec + fallback-tier equivalence
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "quick: per-family smoke tier (~6 min); the full suite stays the final gate",
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in QUICK_MODULES:
            item.add_marker(pytest.mark.quick)


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    spark = get_spark("tests", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
