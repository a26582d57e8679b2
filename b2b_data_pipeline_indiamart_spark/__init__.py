"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference B2B data pipeline (scrape → clean →
analyze → report), rebuilt Spark-first for 100 TB scale.

Subpackages
-----------
functions   column-level expression builders (pure Catalyst, JVM-side)
operators   DataFrame -> DataFrame transformations
sources     readers/sinks (csv w/ checkpoint resume, parquet, table sinks)
plans       the query registry consumed by ``__spark_entry__``
streaming   structured-streaming jobs
"""

__version__ = "0.1.0"
