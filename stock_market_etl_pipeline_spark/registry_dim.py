"""Company-overview dimension queries (SURVEY.md §2.1 S2 + §2.3 J4).

The reference enriches its quote facts with a per-symbol fundamentals dim
fetched from the API (``src/extract.py:160-270``); these queries register
the engine's analog: the deterministic overview dim (sources/overview.py),
a latest-price × broadcast(dim) enrichment join, and a sector rollup of
the tick facts through the dim — the classic star-schema pattern at scale
(fact shuffles once on its own key; the dim always broadcasts).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .oracles import WITH_TICKS
from .registry import avg_cents, register
from .sources.overview import OVERVIEW_CTE, company_overview
from .sources.ticks import ticks


@register(
    "company_overview",
    "WITH " + OVERVIEW_CTE + "SELECT * FROM overview",
)
def q_company_overview(spark, sf_dir):
    """S2: the fundamentals dimension itself — one row per symbol."""
    return company_overview(spark, sf_dir)


@register(
    "overview_enrich",
    WITH_TICKS + ", " + OVERVIEW_CTE + """,
    latest AS (
        SELECT symbol, max_by(close, date) AS latest_close
        FROM ticks GROUP BY 1
    )
    SELECT o.symbol, o.company_name, o.sector, o.industry, o.country,
           l.latest_close,
           CASE WHEN o.market_cap >= 7500000000 THEN 'Large'
                WHEN o.market_cap >= 2500000000 THEN 'Mid'
                ELSE 'Small' END AS cap_bucket,
           ROUND((l.latest_close - o.week52_low)
                 / (o.week52_high - o.week52_low), 6) AS position_52w,
           o.pe_ratio
    FROM latest l JOIN overview o USING (symbol)
    """,
)
def q_overview_enrich(spark, sf_dir):
    """J4/S2: latest close per symbol enriched with the broadcast overview
    dim — market-cap bucket and position inside the 52-week range."""
    t = ticks(spark, sf_dir)
    latest = t.groupBy("symbol").agg(
        F.expr("max_by(close, date)").alias("latest_close")
    )
    dim = company_overview(spark, sf_dir)
    return latest.join(F.broadcast(dim), "symbol").select(
        "symbol",
        "company_name",
        "sector",
        "industry",
        "country",
        "latest_close",
        F.when(F.col("market_cap") >= 7_500_000_000, "Large")
        .when(F.col("market_cap") >= 2_500_000_000, "Mid")
        .otherwise("Small")
        .alias("cap_bucket"),
        F.round(
            (F.col("latest_close") - F.col("week52_low"))
            / (F.col("week52_high") - F.col("week52_low")),
            6,
        ).alias("position_52w"),
        "pe_ratio",
    )


@register(
    "part_price_band_pairs",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_retailprice AS value_a, b.p_retailprice AS value_b
    FROM part a JOIN part b
      ON a.p_partkey < b.p_partkey
     AND abs(a.p_retailprice - b.p_retailprice) <= 0.10
    """,
)
def q_part_price_band_pairs(spark, sf_dir):
    """Band (range) self-join: part pairs within ±0.10 retail price, via
    bucketized candidates + exact verify (operators/rangejoin.py) — the
    oracle runs the naive non-equi join; the Spark plan never does."""
    from .operators.rangejoin import band_self_pairs
    from .sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    return band_self_pairs(
        part, id_col="p_partkey", value_col="p_retailprice", width=0.10
    )


@register(
    "sector_volume_summary",
    WITH_TICKS + ", " + OVERVIEW_CTE + """
    SELECT o.sector,
           CAST(COUNT(DISTINCT t.symbol) AS BIGINT) AS n_symbols,
           CAST(SUM(t.volume) AS BIGINT)            AS total_volume,
           ROUND(SUM(CAST(ROUND(t.close * 100, 0) AS BIGINT))
                 / (100.0 * COUNT(t.close)), 6)         AS avg_close
    FROM ticks t JOIN overview o USING (symbol)
    GROUP BY 1
    """,
)
def q_sector_volume_summary(spark, sf_dir):
    """Fact × broadcast(dim) rollup on a dim attribute: per-sector symbol
    count, total volume, average close. The fact side aggregates after one
    broadcast join — no fact shuffle on the dim key."""
    t = ticks(spark, sf_dir)
    dim = company_overview(spark, sf_dir).select("symbol", "sector")
    return (
        t.join(F.broadcast(dim), "symbol")
        .groupBy("sector")
        .agg(
            F.countDistinct("symbol").cast("bigint").alias("n_symbols"),
            F.sum("volume").cast("bigint").alias("total_volume"),
            avg_cents("close").alias("avg_close"),
        )
    )
