"""python-dtl-spark — a PySpark-native engine with the query and
data-processing capabilities of bwhmather/python-dtl.

The reference (/root/reference/) is a single-process columnar array
interpreter over pyarrow; this package keeps its language and semantics
(DTL scripts, strict typing, explainable provenance) but compiles
directly to Spark DataFrame plans so Catalyst/Tungsten handle
optimization and distributed execution.
"""

from python_dtl_spark.runtime import run, run_files, run_simple
from python_dtl_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["run", "run_files", "run_simple", "get_spark", "__version__"]
