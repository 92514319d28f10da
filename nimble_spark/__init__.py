"""nimble_spark — a PySpark-native analytics engine with the capability
surface of facebookincubator/nimble (columnar table storage with rich
nested types, statistics, data-skipping indexes, flat maps, dedup
columns) plus the relational query surface Spark provides on top, and
large-scale training-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Architecture: Spark-first. Storage rides on Parquet; Nimble's
distinguishing features are re-expressed as connector options, write
transforms, manifest metadata and DataFrame-level operators — not a
translation of the reference's C++ engine.

Reference (capability parity only, no code): /root/reference
(facebookincubator/nimble @ 2026-08-07).
"""

__version__ = "0.1.0"

from nimble_spark.session import get_spark  # noqa: F401
from nimble_spark.registry import QUERIES, register, oracle_map, query_map  # noqa: F401
