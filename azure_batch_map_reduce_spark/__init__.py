"""azure_batch_map_reduce_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the *capabilities* of the reference repo
``se02035/azure-batch-map-reduce`` (a C# Azure-Batch map-reduce driver,
``src/AzureBatch/BatchProcessor/Program.cs``), re-expressed Spark-first:

- the literal fan-out/gather contract (one map task per input file, a
  dependency barrier, one global reduce — ``Program.cs:322-387``) lives in
  :mod:`azure_batch_map_reduce_spark.plans.mapreduce`;
- the derived relational/dataflow operator surface (what users would plug
  into the reference's pluggable map/reduce executable slots,
  ``App.config:16-17``) lives in :mod:`azure_batch_map_reduce_spark.queries`
  and friends, built on the DataFrame API so Catalyst/AQE plan the
  physical execution.
"""

from azure_batch_map_reduce_spark.session import get_spark
from azure_batch_map_reduce_spark.catalog import load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views"]

__version__ = "0.1.0"
