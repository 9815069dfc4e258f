"""Data-size-driven shuffle-width default (sources/tables.py).

The sf100 probe (NOTES r5 session 4) showed the static 32-partition
shuffle collapsing at 600M rows (~19M rows/task → spill); the fix was a
manual SPARK_GRAFT_INITIAL_PARTITIONS=512 env knob. tables.py now sizes
AQE's initialPartitionNum from the on-disk bytes of the largest table
the session reads — these tests pin the formula at the measured
operating points and the monotonic never-shrink session behavior.
"""

import pytest

from stock_market_etl_pipeline_spark.sources import tables
from stock_market_etl_pipeline_spark.sources.tables import (
    _AQE_INITIAL,
    load_table,
    shuffle_width_for,
    tune_shuffle_width,
)

from conftest import SF_DIR


def test_shuffle_width_formula_operating_points():
    # sf100 lineitem ≈ 10.8 GB on disk → the 512 the probe measured as
    # the good knob (255→161 s / 268→118 s)
    assert shuffle_width_for(10_800_000_000, 32) == 512
    # sf10 lineitem ≈ 1.08 GB → 64
    assert shuffle_width_for(1_080_000_000, 32) == 64
    # sf1 lineitem = 108 MB → 4, clamped up to the session floor: every
    # scale the bench/gate runs at keeps today's plans
    assert shuffle_width_for(108_212_849, 32) == 32
    assert shuffle_width_for(10_818_932, 32) == 32  # sf0.1
    assert shuffle_width_for(0, 32) == 32
    # ceiling clamp
    assert shuffle_width_for(10**15, 32) == 2048
    # floor follows the session's static shuffle.partitions (the
    # driver's plain session runs 200)
    assert shuffle_width_for(10_818_932, 200) == 200


def test_session_width_is_monotonic_and_small_sf_neutral(spark):
    prior = spark.conf.get(_AQE_INITIAL, None)
    try:
        spark.conf.unset(_AQE_INITIAL)
        floor = int(spark.conf.get("spark.sql.shuffle.partitions"))
        # reading every driver-gate table leaves the width at the floor —
        # the sf0.1 bench and sf0.01 gate plans are byte-identical
        for name in tables.TABLE_NAMES:
            load_table(spark, SF_DIR, name)
        assert int(spark.conf.get(_AQE_INITIAL)) == floor
        # a big input widens the session...
        assert tune_shuffle_width(spark, 10_800_000_000) == 512
        assert int(spark.conf.get(_AQE_INITIAL)) == 512
        # ...and later small reads never shrink it back
        load_table(spark, SF_DIR, "nation")
        assert int(spark.conf.get(_AQE_INITIAL)) == 512
    finally:
        if prior is None:
            spark.conf.unset(_AQE_INITIAL)
        else:
            spark.conf.set(_AQE_INITIAL, prior)


def test_non_numeric_confs_do_not_crash():
    """Some platforms run shuffle.partitions = 'auto' (ADVICE r6; OSS
    Spark rejects setting it, so this uses a conf stub): the width tuner
    must fall back to the 200 default instead of raising, and a
    non-numeric pre-existing initialPartitionNum is overwritten."""

    class _Conf:
        def __init__(self):
            self.d = {
                "spark.sql.shuffle.partitions": "auto",
                _AQE_INITIAL: "auto",
            }

        def get(self, k, default=None):
            return self.d.get(k, default)

        def set(self, k, v):
            self.d[k] = v

    class _Spark:
        conf = _Conf()

    s = _Spark()
    got = tune_shuffle_width(s, 10_800_000_000)
    assert got == 512
    assert int(s.conf.get(_AQE_INITIAL)) == 512
    # small input with 'auto' floor -> documented 200 default
    s2 = _Spark()
    s2.conf = _Conf()
    del s2.conf.d[_AQE_INITIAL]
    assert tune_shuffle_width(s2, 0) == 200
