"""PySpark-native analytics engine with the query/data-processing
capabilities of haoranleo/MapReduce_Infrastructure (a C++11/gRPC MapReduce
framework), rebuilt Spark-first.

The reference's whole public surface is "run arbitrary map/reduce functions
over newline-delimited text with hash partitioning, per-key grouping and
key-sorted output" (reference: ``external/include/mr_task_factory.h:14-43``,
``src/mr_tasks.h``). Here that surface is:

- ``mapreduce_infrastructure_spark.mr`` — the MapReduce-compat API
  (BaseMapper/BaseReducer/register_tasks/run_mr_job) on Spark RDD/DataFrame.
- ``mapreduce_infrastructure_spark.operators`` — the relational operator
  inventory (filters, aggregations, joins, windows, set ops) expressed as
  DataFrame/SQL plans that Catalyst optimizes.
- ``mapreduce_infrastructure_spark.llm`` — LLM-data-pipeline extensions
  (dedup, similarity search, text analysis, multimodal columns) designed for
  100 TB scale (shuffle-based, spillable, no driver-side collection).
- ``mapreduce_infrastructure_spark.streaming`` — event-time windowing
  (batch-mode first, Structured Streaming variants alongside).

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"

from .session import get_spark, tune  # noqa: F401
from .catalog import TABLES, load_table, register_views  # noqa: F401
