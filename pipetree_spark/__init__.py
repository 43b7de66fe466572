"""pipetree-spark: a PySpark-native analytics + pipeline-orchestration engine.

Re-expresses the capabilities of the reference project ``pipetree/pipetree``
(a content-addressed ML pipeline orchestrator; see SURVEY.md §0 — the
reference checkout at /root/reference is empty, so citations point at
SURVEY.md sections instead of reference file:line) on top of Spark's
DataFrame/SQL/Structured-Streaming stack, and extends it with the
relational / windowing / streaming / LLM-data operator inventory of
SURVEY.md §2.

Layout
------
- ``session``   SparkSession factory + runtime confs (ns-timestamp gotcha).
- ``catalog``   pinned schemas + loaders for the testdata star schema.
- ``exact``     cross-engine determinism helpers (decimal-exact sums,
                round policy) so results hash-match a DuckDB oracle.
- ``ops``       reusable operator builders (relational, windows, text,
                vector, streaming, orchestration).
- ``queries``   the declared query inventory graded by the driver
                (SURVEY.md §2 — every entry has a DuckDB oracle).
- ``pipeline``  reference-parity orchestration: spec → DAG of stages with
                content-addressed incremental materialization (SURVEY §2.10).
"""

from pipetree_spark.session import get_spark, apply_runtime_confs
from pipetree_spark.engine import Engine

__version__ = "0.1.0"

__all__ = ["get_spark", "apply_runtime_confs", "Engine", "__version__"]
