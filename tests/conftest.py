from __future__ import annotations

import os

import pytest

from bulkfhirloader_spark.session import get_spark

# The single source of truth for the suite's test-scale directory; override
# with SPARK_GRAFT_TEST_SF_DIR to run the suite against another scale or a
# relocated testdata layout.  Test files import this instead of hardcoding
# the path (round-6 advisor finding).
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bulkfhirloader-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def rawstat(spark):
    """Hand-built rawstat covering every SURVEY §4.3 gotcha:
    deceased NULL/true/false + datetime-only, unknown city (empty FIPS),
    untracked condition (id 0), null-disease (-999), duplicate conditions,
    non-binary and NULL gender, a deceased patient that must vanish."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("gender", T.StringType()),
            T.StructField("agerange", T.IntegerType()),
            T.StructField("age", T.IntegerType()),
            T.StructField("deceasedboolean", T.BooleanType()),
            T.StructField(
                "location",
                T.StructType(
                    [
                        T.StructField("countyid_fips", T.StringType()),
                        T.StructField("subcountyid_fips", T.StringType()),
                        T.StructField("city", T.StringType()),
                        T.StructField("zipcode", T.StringType()),
                    ]
                ),
            ),
            T.StructField("uniqueconditions", T.ArrayType(T.IntegerType())),
            T.StructField("uniquediseases", T.ArrayType(T.IntegerType())),
        ]
    )
    rows = [
        # alive male in a known town, one tracked disease
        ("p1", "male", 1, 34, None, ("017", "00100", "Acton", "01720"), [11], [5]),
        # alive female, deceasedboolean explicitly false, two diseases
        ("p2", "female", 1, 61, False, ("017", "00100", "Acton", "01720"), [11, 12], [5, 6]),
        # DECEASED — must not appear in any fact
        ("p3", "male", 1, 88, True, ("017", "00100", "Acton", "01720"), [11], [5]),
        # unknown city: empty-string FIPS, still counted (SURVEY §4.3 #4)
        ("p4", "female", 1, 20, None, ("", "", "Atlantis", ""), [13], [7]),
        # non-binary gender: counts in pop only (SURVEY §4.3 #7)
        ("p5", "other", 1, 45, None, ("017", "00100", "Acton", "01720"), [11], [5]),
        # NULL gender: pop only
        ("p6", None, 1, 52, None, ("017", "00100", "Acton", "01720"), [], []),
        # untracked condition (0) and null-disease (-999): excluded by >0
        ("p7", "male", 1, 29, None, ("017", "00100", "Acton", "01720"), [0, 11], [-999, 5]),
    ]
    return spark.createDataFrame(rows, schema)
