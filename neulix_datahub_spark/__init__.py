"""neulix_datahub_spark — a PySpark-native analytics engine.

A brand-new engine re-expressing the capability surface of the
``Faj3ricio/neulix_datahub`` reference (an Airflow + pandas + BigQuery /
Firestore / Sheets ETL hub) as idiomatic, distributed PySpark:

- lazy DataFrame/SQL plans optimized by Catalyst (the reference's delegated
  BigQuery SQL path, ``core/utils/db_core.py:119-135``, becomes
  ``spark.sql`` over registered views),
- columnar Parquet at rest (``core/utils/data_core.py:49-79``),
- declarative single-job profiling (``core/utils/data_core.py:178-299``),
- keyed dedupe-append / upsert semantics (``core/utils/sheets_core.py:163-177``,
  ``core/utils/db_core.py:272-337``),
- plus first-class large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal columns) designed for the 100 TB point.

Everything here derives from public knowledge: the Apache Spark / PySpark
API and the read-only reference repo.
"""

from neulix_datahub_spark.session import get_session

__version__ = "0.1.0"

__all__ = ["get_session", "__version__"]
