"""Session-robustness gate (VERDICT r6 item 2/3).

The driver — and any application embedding this engine — supplies its OWN
SparkSession; under PySpark 4.x that session defaults
``spark.sql.ansi.enabled=true``, while ``session.py`` pins it false. Round 6
shipped a minwise construction whose wrapping ``long`` multiply crashed only
under the driver's ANSI-on session (`lsh.py` affine mix → ARITHMETIC_OVERFLOW;
CORRECTNESS_r06 49/50) — invisible to every local check because they all went
through ``get_spark``. This module pins the contract: EVERY registry query
(public + extra) must execute without error under ANSI **on**. Value-level
parity vs the DuckDB oracles under ANSI-on is covered by
``tools/check_correctness.py`` (which now defaults to an ANSI-on session);
this sweep is the fast in-suite crash gate over all of them.
"""

from __future__ import annotations

import pytest

from ssg_etl_spark.plans.registry import load_all

SPECS = load_all(include_extra=True)


@pytest.fixture(scope="module")
def ansi_spark(spark):
    """The shared test session with ANSI toggled ON for this module.

    ANSI is a runtime SQL conf, so flipping it on the live session exactly
    reproduces a driver-default session for plan purposes; restored after.
    """
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_executes_under_ansi_on(ansi_spark, sf_dir, name):
    from ssg_etl_spark.cache import release_tracked

    try:
        df = SPECS[name].builder(ansi_spark, sf_dir)
        # Full collect (not count): count() lets Catalyst prune the output
        # projection, which would skip evaluating exactly the expressions
        # (overflowing arithmetic, strict casts) ANSI mode polices.
        rows = df.collect()
    finally:
        release_tracked()
    assert rows is not None
