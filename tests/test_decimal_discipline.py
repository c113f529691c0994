"""Property tests for the engine's float-reproducibility discipline.

Contract: for doubles that are not *decimal-rounding ties* at the
aggregation scale, the decimal-routed SUM is bit-identical between
Spark (partial aggregation, any partition order) and DuckDB
(sequential). A tie at scale s is a double whose exact value is an odd
multiple of 10^-s/2 — only binary-exact short fractions (odd/2^(s+1)
after scaling) qualify, e.g. 16.9140625 = odd/128 at s=6; there Spark
casts HALF_UP while DuckDB rounds HALF_EVEN and the engines disagree
by one ulp of the scale. No column in the test corpus can produce
such values (2-decimal money, integral quantities, float32-product
dots at scale 12 carry ~46-bit mantissas), and the last test below
pins the boundary so the exclusion is explicit, not accidental.
"""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# money-like doubles: 2 fractional decimal digits, like every double
# column in the corpus — never a scale-6 tie
cents = st.integers(min_value=-10**11, max_value=10**11).map(lambda c: c / 100.0)


def duck_dsum(values):
    con = duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
    return con.sql("SELECT CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) FROM t").fetchone()[0]


def spark_dsum(spark, values, nparts=7):
    from porcupine_spark.plans.relational import dsum

    sdf = spark.createDataFrame([(v,) for v in values], "v double").repartition(nparts)
    return sdf.agg(dsum(F.col("v")).alias("s")).collect()[0].s


@given(st.lists(cents, min_size=1, max_size=30))
@settings(max_examples=12, deadline=None)
def test_dsum_matches_duckdb_bitwise(spark, values):
    assert spark_dsum(spark, values) == duck_dsum(values)  # EXACT, no tolerance


def test_dsum_partition_invariant(spark):
    """Same data, different partitionings -> identical bits (the
    property raw double sums do NOT have)."""
    from porcupine_spark.plans.relational import dsum

    vals = [(0.1 * i,) for i in range(1, 1000)]
    sums = set()
    for nparts in (1, 7, 32):
        df = spark.createDataFrame(vals, "v double").repartition(nparts)
        sums.add(df.agg(dsum(F.col("v")).alias("s")).collect()[0].s)
    assert len(sums) == 1


def test_dsum_long_random_mantissas_agree(spark):
    """Arbitrary-mantissa doubles (products, divisions — what derived
    columns look like) are never scale-6 ties: engines agree."""
    import random

    rng = random.Random(42)
    vals = [rng.uniform(-1e6, 1e6) * rng.uniform(0, 1) for _ in range(500)]
    assert spark_dsum(spark, vals) == duck_dsum(vals)


def test_decimal_tie_boundary_is_real(spark):
    """The documented exclusion: an odd/128 value IS a scale-6 tie and
    the engines legitimately differ by 1e-6 there (HALF_UP vs
    HALF_EVEN). If this ever starts passing equal, the boundary moved
    and the discipline docs should be revisited."""
    tie = 16.9140625  # = 2165/128 exactly; .9140625 -> .914063 vs .914062
    got, want = spark_dsum(spark, [tie], nparts=1), duck_dsum([tie])
    assert got == pytest.approx(want, abs=2e-6)
    assert got != want


bigsigned = st.integers(min_value=-(10**30), max_value=10**30)
bigpos = st.integers(min_value=1, max_value=10**30)


def _trunc_div(p: int, q: int) -> int:
    """Truncate-toward-zero division (Python's // floors)."""
    r = abs(p) // abs(q)
    return -r if (p < 0) != (q < 0) else r


@given(st.lists(st.tuples(bigsigned, bigpos), min_size=1, max_size=8))
@settings(max_examples=10, deadline=None)
def test_integer_scaled_div_matches_duckdb(spark, pairs):
    """The bm25/twap/growth recipe: Spark's decimal `div` (truncate
    toward zero) and DuckDB's HUGEINT `//` agree exactly — INCLUDING
    for negative numerators (the revenue-decline path of
    revenue_mom_growth: both engines truncate toward zero, NOT floor,
    which Python's // does) — WHILE THE QUOTIENT FITS int64, the
    recipe's documented domain (every use scales a bounded ratio, so
    quotients are ~1e12). Outside it Spark WRAPS silently (next
    test)."""
    pairs = [(p, q) for p, q in pairs if abs(p) // q < 2**63] or [(-7, 2)]
    rows = [(str(p), str(q)) for p, q in pairs]
    sdf = spark.createDataFrame(rows, "p string, q string").selectExpr(
        "CAST(p AS DECIMAL(38,0)) div CAST(q AS DECIMAL(38,0)) AS d"
    )
    got = [r.d for r in sdf.collect()]
    con = duckdb.connect()
    want = [
        con.sql(
            f"SELECT CAST(CAST('{p}' AS HUGEINT) // CAST('{q}' AS HUGEINT) AS BIGINT)"
        ).fetchone()[0]
        for p, q in rows
    ]
    py = [_trunc_div(p, q) for p, q in pairs]
    assert got == want == py


def test_integer_scaled_div_negative_pinned(spark):
    """Pinned negative-operand witnesses for the truncation direction:
    -7 div 2 is -3 on both engines (trunc), not -4 (floor)."""
    cases = [(-7, 2), (-1, 3), (-10**18 - 1, 7), (7, 2)]
    rows = [(str(p), str(q)) for p, q in cases]
    sdf = spark.createDataFrame(rows, "p string, q string").selectExpr(
        "CAST(p AS DECIMAL(38,0)) div CAST(q AS DECIMAL(38,0)) AS d"
    )
    got = [r.d for r in sdf.collect()]
    con = duckdb.connect()
    want = [
        con.sql(
            f"SELECT CAST(CAST('{p}' AS HUGEINT) // CAST('{q}' AS HUGEINT) AS BIGINT)"
        ).fetchone()[0]
        for p, q in rows
    ]
    assert got == want == [_trunc_div(p, q) for p, q in cases]
    assert got[0] == -3  # trunc, not floor's -4


def test_integer_scaled_div_overflow_boundary(spark):
    """Past int64 the engines DIVERGE: Spark's decimal `div` wraps to
    the two's-complement residue silently (non-ANSI), DuckDB errors. Pinned so the recipe
    is never applied to unbounded quotients by accident."""
    sdf = spark.sql(
        "SELECT CAST('1" + "0" * 30 + "' AS DECIMAL(38,0)) div CAST(1 AS DECIMAL(38,0)) AS d"
    )
    wrapped = ((10**30 + 2**63) % 2**64) - 2**63  # two's-complement wrap
    assert sdf.collect()[0].d == wrapped  # silent wrap — the hazard
    con = duckdb.connect()
    with pytest.raises(Exception):
        con.sql(
            "SELECT CAST(CAST('1" + "0" * 30 + "' AS HUGEINT) // 1 AS BIGINT)"
        ).fetchone()
