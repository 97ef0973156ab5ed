import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

TEST_PAGES = "/root/reference/test-pages"
BASE_URL = "http://fakehost/test/page.html"

# goldens imported verbatim from mozilla/readability are js-beautified
# (whitespace collapsed, soft hyphens stripped); the reference's own harness
# also only compares whitespace-normalized text (parser_test.go:175-256), so
# byte-identity is defined over the goldens the reference generator itself
# produced (scripts/generate-test.go) and normalized identity over the rest.
# Only these 2 remain non-byte-reachable (FIXTURES.md §7: their goldens were
# generated from a differently-formatted source revision); videos-2/wapo-2
# byte-match since round 4 and are held to full byte identity.
BEAUTIFIED_GOLDENS = {"theverge", "visibility-hidden"}


def fixture_cases():
    if not os.path.isdir(TEST_PAGES):
        return []
    return sorted(
        c
        for c in os.listdir(TEST_PAGES)
        if os.path.isfile(os.path.join(TEST_PAGES, c, "source.html"))
    )


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '4')}]")
        .appName("go-readability-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="module", autouse=True)
def _clear_cache_between_modules(request):
    """Drop cached blocks after each test module so persisted
    intermediates (operator-internal persists like minhash's shingle
    table, module fixtures' .cache()) don't accumulate across the whole
    suite and squeeze execution memory — the source of the round-4
    TaskMemoryManager page-allocation flake under full-suite load."""
    yield
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        try:
            active.catalog.clearCache()
        except Exception:
            pass  # session already stopped by the module itself
