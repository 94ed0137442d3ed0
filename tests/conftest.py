import shutil
import sys

import pytest

sys.path.insert(0, "/root/repo")

from type_filtered_entity_linker_spark.config import LinkerConfig
from type_filtered_entity_linker_spark.fixtures import (
    fixtures_to_spark,
    make_fixtures,
)
from type_filtered_entity_linker_spark.oracle import link_corpus
from type_filtered_entity_linker_spark.session import spark_session

SEED = 42
N_PAGES = 400

@pytest.fixture(scope="session")
def spark():
    s = spark_session(
        app_name="tests", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fx():
    return make_fixtures(seed=SEED, n_pages=N_PAGES)


@pytest.fixture(scope="session")
def golden(fx):
    return link_corpus(fx, LinkerConfig())


@pytest.fixture(scope="session")
def inputs(spark, fx):
    return fixtures_to_spark(spark, fx)


@pytest.fixture()
def workdir(tmp_path):
    d = str(tmp_path / "wd")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def assert_df_equal(spark_df, golden_pdf, keys, float_cols=(), tol=1e-9):
    """Order-insensitive exact comparison of a Spark DF vs a pandas DF."""
    s = spark_df.toPandas().sort_values(keys).reset_index(drop=True)
    g = golden_pdf.sort_values(keys).reset_index(drop=True)
    s = s[list(g.columns)]
    assert len(s) == len(g), f"row counts differ: spark={len(s)} golden={len(g)}"
    for c in g.columns:
        if c in float_cols:
            assert (s[c] - g[c]).abs().max() <= tol, f"column {c} differs"
        else:
            assert s[c].eq(g[c]).all(), f"column {c} differs"
