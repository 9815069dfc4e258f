"""Custom Spark 4 Python DataSource for quote-API ingestion (S1-S3).

The reference fetches per-symbol OHLCV JSON from the Alpha Vantage HTTP
API with a 12 s inter-call rate limit (``src/extract.py:273-334``). As a
Spark source that becomes a DataSource with ONE INPUT PARTITION PER
SYMBOL: each executor task "fetches" its symbol independently, the
rate-limit lives in the task (option ``delay_s``; per-partition, which is
exactly how a per-API-key budget shards), and failures surface as task
retries instead of driver-loop placeholders.

No network in this environment — the fetch is a deterministic synthetic
payload built with the same md5-hash walk as sources/synthetic.py, marked
clearly where the real ``requests.get`` call would go. The Spark-side
contract (schema, partition planning, option handling, string-typed raw
values) is the real thing.

Usage:
    spark.dataSource.register(QuoteAPIDataSource)
    spark.read.format("quote_api")
         .option("symbols", "AAPL,MSFT").option("days", "100").load()
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

API_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("open", T.StringType(), True),
        T.StructField("high", T.StringType(), True),
        T.StructField("low", T.StringType(), True),
        T.StructField("close", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),
        T.StructField("data_source", T.StringType(), True),
    ]
)


class SymbolPartition(InputPartition):
    def __init__(self, symbol: str):
        self.symbol = symbol


def _hash_u(seed: str) -> float:
    return int(hashlib.md5(seed.encode()).hexdigest()[:15], 16) / float(1 << 60)


def _fake_fetch(symbol: str, days: int) -> list[tuple]:
    """Deterministic stand-in for the HTTP GET + JSON parse.

    REAL-SOURCE INTEGRATION POINT: replace the body with
    ``requests.get(API_URL, params={...}, timeout=30)`` + the error
    handling of reference src/extract.py:18-157 (invalid symbol →
    ValueError, rate-limit note → retry, network error → raise so the
    task retries).
    """
    import datetime as dt

    base = 100.0 + (_hash_u(f"base|{symbol}") * 400.0)
    price = base
    rows = []
    start = dt.date(2024, 1, 1)
    for i in range(days):
        d = start + dt.timedelta(days=i)
        step = (_hash_u(f"step|{symbol}|{d}") - 0.5) * 2.0
        spread = _hash_u(f"spread|{symbol}|{d}") * 2.0
        open_ = price
        price = max(price + step, 1.0)
        # OHLC invariants by construction: high ≥ max(open, close),
        # low ≤ min(open, close), all > 0
        high = max(open_, price) + spread
        low = max(min(open_, price) - spread, 0.5)
        rows.append(
            (
                symbol,
                d.isoformat(),
                f"{open_:.4f}",
                f"{high:.4f}",
                f"{low:.4f}",
                f"{price:.4f}",
                str(1_000_000 + int(_hash_u(f"vol|{symbol}|{d}") * 1_000_000)),
                "quote_api",
            )
        )
    return rows


class QuoteAPIReader(DataSourceReader):
    def __init__(self, options: dict):
        self.symbols = [
            s.strip().upper()
            for s in options.get("symbols", "AAPL").split(",")
            if s.strip()
        ]
        self.days = int(options.get("days", "100"))
        self.delay_s = float(options.get("delay_s", "0"))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per symbol: the unit of parallelism AND of
        # per-API-key rate limiting
        return [SymbolPartition(s) for s in self.symbols]

    def read(self, partition: SymbolPartition) -> Iterator[tuple]:
        import time

        if self.delay_s:
            time.sleep(self.delay_s)  # per-partition rate limit budget
        yield from _fake_fetch(partition.symbol, self.days)


class QuoteAPIDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "quote_api"

    def schema(self):
        return API_SCHEMA

    def reader(self, schema) -> QuoteAPIReader:
        return QuoteAPIReader(self.options)

    def simpleStreamReader(self, schema) -> "QuoteAPIStreamReader":
        return QuoteAPIStreamReader(self.options)


class QuoteAPIStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch polling reader: each batch serves the next day's quotes
    for every symbol — the streaming translation of the reference's daily
    scheduled re-fetch (``scheduler.py:110``). Offsets are day indices, so
    restart resumes exactly at the unserved day (checkpointed by Spark).
    """

    def __init__(self, options: dict):
        self.symbols = [
            s.strip().upper()
            for s in options.get("symbols", "AAPL").split(",")
            if s.strip()
        ]
        self.days = int(options.get("days", "5"))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict):
        day = start["day"]
        if day >= self.days:
            return iter([]), {"day": day}
        rows = []
        for s in self.symbols:
            rows.append(_fake_fetch(s, day + 1)[day])
        return iter(rows), {"day": day + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows = []
        for day in range(start["day"], end["day"]):
            for s in self.symbols:
                rows.append(_fake_fetch(s, day + 1)[day])
        return iter(rows)

    def commit(self, end: dict) -> None:
        pass
