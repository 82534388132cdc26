import os
import sys

import pytest

# Make the repo importable when pytest is run from anywhere.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from modern_document_converter_for_ai_library_spark.plans import get_spark

    spark = get_spark(
        app_name="mdcal-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield spark
    spark.stop()
