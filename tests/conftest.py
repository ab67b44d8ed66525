import pyarrow as pa
import pytest

from python_dtl_spark import run_simple
from python_dtl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("dtl-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture
def run_dtl(spark):
    """Run a DTL script over in-memory Arrow tables, mirroring the
    reference test harness (/root/reference/tests/conftest.py:11-36):
    dict of pa.Table in, dict of pa.Table out, row order preserved."""

    def _run(source: str, data: dict[str, pa.Table]) -> dict[str, pa.Table]:
        inputs = {
            name: spark.createDataFrame(table.to_pandas())
            for name, table in data.items()
        }
        outputs = run_simple(source, spark=spark, inputs=inputs, ordered=True)
        return {
            name: pa.Table.from_pandas(df.toPandas(), preserve_index=False)
            for name, df in outputs.items()
        }

    return _run
