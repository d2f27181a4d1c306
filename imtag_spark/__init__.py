"""imtag_spark — a PySpark-native link-graph analytics engine.

A from-scratch, idiomatic-Spark engine whose query capabilities generalize
the reference ``Steve132/imtag`` (a C++ two-pass connected-components
labeling library, read-only at /root/reference): connected components,
PageRank, label propagation, triangle counting, component statistics,
run-length ingest, interval joins, morphology — all expressed as
DataFrame/Catalyst plans with vectorized Arrow UDFs on the narrow paths,
plus the dataset-pipeline operators (dedup, similarity search, text
analysis) a large-scale training-data pipeline needs.

Nothing here is a port: the reference tells us WHAT to compute (operator
semantics, labeling contract, test oracles — see SURVEY.md), not HOW.
"""

__version__ = "0.1.0"

from imtag_spark.session import get_spark  # noqa: F401
