"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``Ay0bami/Machine-Learning-Algorithm-SparkML-``.

The reference (see SURVEY.md) is Spark client code: three spark-shell
Scala scripts building Random-Forest pipelines over CSV tables. This
package re-expresses that full capability surface — plus the LLM-data-
pipeline extensions required by BASELINE.json — as an idiomatic PySpark
library:

- ``session``     : SparkSession construction tuned for AQE / Arrow / UTC
- ``sources``     : parquet/CSV readers and writers with explicit schemas
- ``operators``   : relational operators (project/filter/join/window/setops),
                    dedup, similarity search, multimodal column plumbing
- ``functions``   : scalar column expressions (text analysis, vector math)
- ``ml``          : feature encoders, Random Forest pipelines, tuning,
                    class rebalancing (reference parity M1-M12)
- ``plans``       : physical-plan inspection helpers (pushdown/broadcast)
- ``streaming``   : Structured Streaming over the events table

Everything is DataFrame-first: functions take and return DataFrames and
build lazy Catalyst plans; no RDDs, no driver-side row loops.
"""

from machine_learning_algorithm_sparkml__spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
