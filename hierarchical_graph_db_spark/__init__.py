"""hierarchical_graph_db_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference system ``ChetanaMuralidharan/Hierarchical-Graph-DB``
(an email-ingestion + hierarchical-graph pipeline; see SURVEY.md), extended with
the operators a large-scale LLM training-data pipeline needs (dedup families,
similarity search, multimodal columns, text analysis).

Design stance (SURVEY.md §7):

* Declare logical plans with the DataFrame/SQL API; let Catalyst + AQE pick
  physical strategies (broadcast vs sort-merge, partition coalescing, skew
  handling).
* Python UDFs only where Spark genuinely can't express the semantics
  (RFC822 parsing, opaque-binary decode) — always Arrow-batched, never per-row.
* Every operator is designed for a 1000-executor / 100 TB deployment and
  validated for correctness on the small synthetic scale factors.
"""

from hierarchical_graph_db_spark.session import get_spark, stop_spark
from hierarchical_graph_db_spark.io import Catalog

__all__ = ["get_spark", "stop_spark", "Catalog"]

__version__ = "0.1.0"
