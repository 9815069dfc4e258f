"""SQL API surface: temp views over every source + derived table.

The reference's users interact through SQL as much as through Python (its
dashboard issues raw SQL against the warehouse table, ``dashboard/
app.py:105-110``). ``register_views`` exposes the same surface on Spark:
all ten testdata tables plus the derived ``ticks`` / ``enriched`` /
``overview`` series as temporary views, so ``spark.sql("SELECT ... FROM
enriched ...")`` works with zero DataFrame code. Views are lazy plans —
registering them costs nothing until queried, and every SQL query gets the
same Catalyst plan (pushdown, broadcast, window reuse) as the DataFrame
API, since they ARE the same plans.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators.enrich import enrich
from .sources.overview import company_overview
from .sources.tables import TABLE_NAMES, load_table
from .sources.ticks import ticks

DERIVED_VIEWS = ("ticks", "enriched", "overview")


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create/replace temp views for all base tables + derived series.

    Returns the list of view names registered.
    """
    names: list[str] = []
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
        names.append(name)
    t = ticks(spark, sf_dir)
    t.createOrReplaceTempView("ticks")
    enrich(t).createOrReplaceTempView("enriched")
    company_overview(spark, sf_dir).createOrReplaceTempView("overview")
    names.extend(DERIVED_VIEWS)
    return names
