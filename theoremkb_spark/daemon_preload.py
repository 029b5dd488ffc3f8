"""Python-worker daemon with the heavy imports preloaded.

Spark's python workers are forked from a daemon process
(``pyspark.daemon``).  A forked worker inherits the daemon's imported
modules, but the stock daemon only carries pyspark core — every fresh
worker pays the pandas/pyarrow/numpy import (~1.5 s of CPU) on its
first Arrow batch.  Under high parallelism with chained pandas UDFs the
worker pool churns (we measured >200 distinct worker PIDs in one
local[32] run), so that import tax is paid hundreds of times and the
job anti-scales.

Importing the Arrow/pandas stack *into the daemon* makes every fork
inherit it for free: worker spin-up drops from ~1.5 s to ~10 ms.

Enabled via ``spark.python.daemon.module=theoremkb_spark.daemon_preload``
(set in ``session.get_spark``).  The module must be importable on the
executor python path — with ``--py-files theoremkb_spark.zip`` it is.
"""

# Heavy stacks first; failures fall through to a stock daemon rather
# than breaking worker startup (e.g. a stripped-down executor image).
try:  # pragma: no cover - trivial import shims
    import numpy  # noqa: F401
    import pandas  # noqa: F401
    import pyarrow  # noqa: F401

    # the lazy pyspark halves that workers touch on their first batch
    import pyspark.sql.pandas.serializers  # noqa: F401
    import pyspark.sql.pandas.types  # noqa: F401
except Exception:  # noqa: BLE001
    pass

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
