"""pypiper-spark: a PySpark-native analytics engine with the pipeline
capabilities of daniyall/pyPiper, extended with relational, streaming,
and LLM-data-pipeline operators (SURVEY.md section 2B).

Everything is built on the public PySpark DataFrame/SQL API; Catalyst +
AQE own physical planning. The pyPiper-style ``Pipeline``/``Node``
composition API (pypiper_spark.pipeline) is a thin veneer over
``DataFrame.transform`` chains — there is no second execution path.
"""

from pypiper_spark.session import get_spark
from pypiper_spark.catalog import TABLES, load_table, register_views
from pypiper_spark.pipeline import BATCH_SIZE_ALL, MapBatches, Node, Pipeline, node
from pypiper_spark.progress import track_progress

__all__ = [
    "get_spark",
    "TABLES",
    "load_table",
    "register_views",
    "Node",
    "node",
    "Pipeline",
    "MapBatches",
    "BATCH_SIZE_ALL",
    "track_progress",
]
__version__ = "0.1.0"
