"""dataflowex_spark — a PySpark-native analytics/ETL engine.

A ground-up re-expression of the capabilities of gridsum/DataflowEx
(a C# TPL-Dataflow ETL framework: typed pipeline composition,
map/flatMap/filter-routing/broadcast/key-dispatch/batch stages, bulk
DB sinks, and a dimension-lookup-join-with-insert-missing operator)
on Spark's DataFrame / SQL / Structured Streaming stack, extended
with large-scale training-data operators (dedup, similarity search,
text analysis, multimodal column plumbing).

Design rules (see SURVEY.md):
- DataFrame-first; plans stay declarative so Catalyst optimizes them.
- Pandas UDFs only where built-ins cannot express the semantics.
- Every operator is designed for 100 TB / multi-executor scale:
  broadcast small sides, shuffle on explicit keys, no driver collects
  in data paths.
"""

from dataflowex_spark.session import get_spark, configure
from dataflowex_spark.catalog import Catalog, TABLES
from dataflowex_spark.pipeline import Pipeline

__all__ = ["get_spark", "configure", "Catalog", "TABLES", "Pipeline"]
__version__ = "0.1.0"
