"""Distributed exact linear algebra: an anisotropy probe of the
embedding covariance by integer fixed-point power iteration.

Why it belongs in a training-data engine: embedding collections that
collapse toward a dominant direction retrieve badly ("all-but-the-top"
anisotropy); the certified diagnostic is how far the top eigenvalue
sits above the mean eigenvalue (trace/d). Power iteration converges
the EIGENVECTOR only as fast as the spectral gap allows (this corpus
has lambda2/lambda1 ~ 0.99, so k=8 steps do NOT pin the direction —
measured, not assumed), but the iterate's Rayleigh quotient is a
CERTIFIED LOWER BOUND on lambda1 after any number of steps, and that
bound against trace/d is the anisotropy alarm. The reference has no
vector surface at all; this extends the beyond-reference similarity
family.

Exactness discipline (the pagerank precedent — components.py — for
iterative algorithms with hash oracles): every quantity is an integer.
Elements truncate to micro units; the covariance is the cross-
multiplied integer form n*S - sx*sx^T (no mean division); the matrix
is normalized once to |c| <= 1e6 by one truncating division (keeps
every later product inside 128-bit); each power-iteration step
renormalizes by max|w| with the SAME truncating division on both
engines. The oracle unrolls the K iterations as CTEs.

Scale posture: the Gram pass is mapInPandas with a per-batch int64
numpy X^T X (batch sums bounded: |x|<=8e6 micro, 1e4-row batches =>
< 2^63), emitting ONE dims^2 partial per batch — the shuffle carries
4096-row partials, never vectors. The iteration itself runs on the
driver over the collected dims x dims matrix: 4096 integers, bounded
by the MODEL dimension, not the corpus (the union-find <= 2M edges
class of justified driver work).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from porcupine_spark.plans.registry import query
from porcupine_spark.tables import load_table

DIMS = 64
POWER_ITERS = 8
W_SCALE = 1_000_000  # eigenvector fixed-point scale per iteration
C_SCALE = 1_000_000  # covariance normalization scale


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division (Spark `div`, DuckDB `//`;
    Python's // floors, so negatives need the sign dance)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def power_iterate(cov: dict[tuple[int, int], int], dims: int, iters: int):
    """Exact fixed-point power iteration over an integer matrix given as
    {(a, b): c}; returns (w, rayleigh_micro) with w in micro units."""
    w = [W_SCALE] * dims  # deterministic all-ones start
    for _ in range(iters):
        nxt = [
            sum(cov.get((a, b), 0) * w[b] for b in range(dims))
            for a in range(dims)
        ]
        s = max(abs(v) for v in nxt)
        if s == 0:
            break
        w = [_tdiv(v * W_SCALE, s) for v in nxt]
    num = sum(
        w[a] * cov.get((a, b), 0) * w[b] for a in range(dims) for b in range(dims)
    )
    den = sum(v * v for v in w)
    return w, _tdiv(num * 1_000_000, den)


# The oracle builds the same normalized covariance, then unrolls the
# K iterations as CTEs (w0 .. wK), renormalizing each step.
def _oracle_sql() -> str:
    steps = []
    prev = "w0"
    for k in range(1, POWER_ITERS + 1):
        steps.append(
            f"""r{k} AS MATERIALIZED (
      SELECT c.a AS d, SUM(c.v * {prev}.v) AS v
      FROM cnorm c JOIN {prev} ON c.b = {prev}.d GROUP BY c.a
    ),
    s{k} AS MATERIALIZED (SELECT MAX(ABS(v)) AS s FROM r{k}),
    w{k} AS MATERIALIZED (
      SELECT d, CAST(v * {W_SCALE} // (SELECT s FROM s{k}) AS HUGEINT) AS v
      FROM r{k}
    )"""
        )
        prev = f"w{k}"
    unrolled = ",\n    ".join(steps)
    return f"""
    WITH elems AS MATERIALIZED (
      SELECT vec_id, g.i - 1 AS d,
             CAST(TRUNC(CAST(embedding[g.i] AS DOUBLE) * 1e6) AS HUGEINT) AS x
      FROM embeddings,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, {DIMS})) AS i) g
    ),
    sums AS (SELECT d, SUM(x) AS sx FROM elems GROUP BY d),
    n AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM embeddings),
    gram AS MATERIALIZED (
      SELECT ea.d AS a, eb.d AS b, SUM(ea.x * eb.x) AS s
      FROM elems ea JOIN elems eb USING (vec_id)
      GROUP BY ea.d, eb.d
    ),
    cov AS MATERIALIZED (
      SELECT g.a, g.b,
             (SELECT n FROM n) * g.s - sa.sx * sb.sx AS c
      FROM gram g JOIN sums sa ON sa.d = g.a JOIN sums sb ON sb.d = g.b
    ),
    cmax AS MATERIALIZED (SELECT MAX(ABS(c)) AS m FROM cov),
    cnorm AS MATERIALIZED (
      SELECT a, b, CAST(c * {C_SCALE} // (SELECT m FROM cmax) AS HUGEINT) AS v
      FROM cov
    ),
    w0 AS (
      SELECT UNNEST(GENERATE_SERIES(0, {DIMS - 1})) AS d,
             CAST({W_SCALE} AS HUGEINT) AS v
    ),
    {unrolled},
    ray AS (
      SELECT CAST(SUM(wa.v * c.v * wb.v) AS HUGEINT) AS num
      FROM cnorm c JOIN {prev} wa ON wa.d = c.a JOIN {prev} wb ON wb.d = c.b
    ),
    den AS (SELECT SUM(v * v) AS den FROM {prev}),
    tr AS (SELECT SUM(v) AS t FROM cnorm WHERE a = b)
    SELECT w.d AS dim,
           CAST(w.v AS BIGINT) AS iterate_micro,
           CAST((SELECT num FROM ray) * 1000000 // (SELECT den FROM den)
                AS BIGINT) AS rayleigh_lb_micro,
           CAST((SELECT t FROM tr) * 1000000 // {DIMS} AS BIGINT)
             AS mean_eig_micro,
           CAST((SELECT num FROM ray) * 1000000 // (SELECT den FROM den)
                * 1000000
                // ((SELECT t FROM tr) * 1000000 // {DIMS}) AS BIGINT)
             AS anisotropy_lb_ppm,
           CAST((SELECT m FROM cmax) AS DOUBLE) AS cov_max_abs
    FROM {prev} w
    """


@query(
    "embedding_anisotropy_probe",
    _oracle_sql(),
    tags=("similarity", "linalg", "iterative", "monitoring"),
    doc=f"Anisotropy probe of the embedding covariance by "
    f"{POWER_ITERS}-step integer fixed-point power iteration, computed "
    "EXACTLY: micro-unit elements, cross-multiplied covariance "
    "n*S - sx*sx^T (no mean division), one-time matrix normalization "
    "to |c| <= 1e6 (keeps all later products in 128 bits; directions "
    "are scale-invariant), per-step max-|w| renormalization by "
    "truncating division. The iterate's Rayleigh quotient is a "
    "CERTIFIED lower bound on the top eigenvalue at ANY step count — "
    "the honest deliverable when the spectral gap is small (here "
    "lambda2/lambda1 ~ 0.99, so the direction itself is NOT claimed "
    "converged; the pytest checks the bound's validity against numpy, "
    "not direction equality). anisotropy_lb_ppm = rayleigh vs the mean "
    "eigenvalue trace/d: >> 1e6 means one direction dominates and "
    "retrieval quality is at risk. The oracle unrolls the iterations "
    "as MATERIALIZED CTEs — an ITERATIVE algorithm with a full hash "
    "oracle (the pagerank precedent). Distributed part: one "
    f"mapInPandas Gram pass emitting a {DIMS}x{DIMS} integer partial "
    "per Arrow batch (vectors never shuffle); the iteration runs on "
    "the driver over 4096 integers — bounded by model dims, not data.",
)
def embedding_anisotropy_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings")

    def gram_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            # float32 -> float64 is exact; *1e6 of values |v|<~8 stays
            # far under 2^53, so the int64 cast is the exact micro int
            xi = (x * 1_000_000).astype(np.int64)
            g = xi.T @ xi  # int64: |x|<=8e6 => |sum| < 1e4*6.4e13 < 2^63
            sx = xi.sum(axis=0)
            a, b = np.meshgrid(range(DIMS), range(DIMS), indexing="ij")
            yield pd.DataFrame(
                {
                    "a": a.ravel(),
                    "b": b.ravel(),
                    "s": g.ravel(),
                    "sx_a": np.repeat(sx, DIMS),
                    "n_rows": np.int64(len(pdf)),
                }
            )

    partials = emb.select("embedding").mapInPandas(
        gram_partials, schema="a int, b int, s long, sx_a long, n_rows long"
    )
    # one shuffle of dims^2-keyed partials; sums stay exact in decimal
    agg = partials.groupBy("a", "b").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("sx_a").cast("decimal(38,0)")).alias("sxa_dup"),
        F.sum(F.col("n_rows").cast("decimal(38,0)")).alias("n_dup"),
    )
    rows = agg.collect()  # dims^2 = 4096 rows: model-bounded driver work
    s = {(r.a, r.b): int(r.s) for r in rows}
    # sx_a was emitted per (a,b) cell; any b slice carries the dim-a sum
    sx = {r.a: int(r.sxa_dup) for r in rows if r.b == 0}
    n = int(next(r.n_dup for r in rows if r.a == 0 and r.b == 0))
    cov = {
        (a, b): n * s[(a, b)] - sx[a] * sx[b]
        for a in range(DIMS)
        for b in range(DIMS)
    }
    cmax = max(abs(v) for v in cov.values())
    cnorm = {k: _tdiv(v * C_SCALE, cmax) for k, v in cov.items()}
    w, rayleigh = power_iterate(cnorm, DIMS, POWER_ITERS)
    trace = sum(cnorm.get((d, d), 0) for d in range(DIMS))
    mean_eig = _tdiv(trace * 1_000_000, DIMS)
    anis = _tdiv(rayleigh * 1_000_000, mean_eig)
    # the scale constant is reported as a double (exact hugeint ->
    # correctly-rounded double on both engines); the exact integers are
    # the iterate, the Rayleigh bound, and the trace-derived mean
    out = [(d, w[d], rayleigh, mean_eig, anis, float(cmax)) for d in range(DIMS)]
    return spark.createDataFrame(
        out,
        "dim long, iterate_micro long, rayleigh_lb_micro long,"
        " mean_eig_micro long, anisotropy_lb_ppm long, cov_max_abs double",
    )


def _sql_isqrt(x: str) -> str:
    s = f"CAST(FLOOR(SQRT(CAST({x} AS DOUBLE))) AS HUGEINT)"
    return (
        f"(CASE WHEN ({s}+1)*({s}+1) <= {x} THEN {s}+1 "
        f"WHEN {s}*{s} > {x} THEN {s}-1 ELSE {s} END)"
    )


@query(
    "embedding_dim_scaling_plan",
    f"""
    WITH elems AS (
      SELECT g.i - 1 AS d,
             CAST(TRUNC(CAST(embedding[g.i] AS DOUBLE) * 1e6) AS HUGEINT) AS x
      FROM embeddings,
           LATERAL (SELECT UNNEST(GENERATE_SERIES(1, {DIMS})) AS i) g
    ),
    st AS (
      SELECT d, COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
      FROM elems GROUP BY d
    ),
    v AS (
      SELECT d, n, sx,
             (n * sxx - sx * sx) // (n * (n - 1)) AS var_micro2
      FROM st
    )
    SELECT CAST(d AS BIGINT) AS dim,
           CAST(sx // n AS BIGINT) AS mean_micro,
           CAST(var_micro2 AS BIGINT) AS var_micro2,
           CAST({_sql_isqrt('var_micro2')} AS BIGINT) AS std_micro,
           CAST(CASE WHEN {_sql_isqrt('var_micro2')} > 0
                THEN 1000000000000 // {_sql_isqrt('var_micro2')}
                ELSE 0 END AS BIGINT) AS inv_scale_micro
    FROM v
    """,
    tags=("similarity", "linalg", "planning", "monitoring"),
    doc="Per-dimension standardization plan (diagonal whitening): mean, "
    "sample variance, std and 1/std per embedding dimension — the "
    "feature-scaling table applied before scalar quantization or IVF "
    "when dimensions carry wildly different energies (a hot dimension "
    "dominates every integer dot product; sq8_topk's single global "
    "scale silently wastes bits on the quiet dims — this plan is the "
    "fix). All integer-exact: micro elements, cross-multiplied "
    "variance (n*Sxx - Sx^2)/(n(n-1)) with one truncating division, "
    "std by the exact isqrt (float sqrt + two-arm correction), 1/std "
    "as 1e12-scaled truncating reciprocal. One posexplode pass, one "
    "(dim)-keyed aggregation — rows = model dims, not data.",
)
def embedding_dim_scaling_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    elems = emb.select(F.posexplode("embedding").alias("d", "v")).select(
        "d", F.expr("CAST(CAST(v AS DOUBLE) * 1e6 AS BIGINT)").alias("x")
    )
    st = elems.groupBy("d").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).alias("sxx"),
    )
    v = st.select(
        "d",
        "n",
        "sx",
        F.expr("(n * sxx - sx * sx) div (n * (n - 1))").alias("var_micro2"),
    )
    # exact integer sqrt: float sqrt + two-arm correction (< 2^52 safe)
    s = F.floor(F.sqrt(F.col("var_micro2").cast("double"))).cast("long")
    std = (
        F.when((s + 1) * (s + 1) <= F.col("var_micro2"), s + 1)
        .when(s * s > F.col("var_micro2"), s - 1)
        .otherwise(s)
    )
    return v.select(
        F.col("d").cast("long").alias("dim"),
        F.expr("CAST(sx div n AS BIGINT)").alias("mean_micro"),
        F.col("var_micro2").cast("long").alias("var_micro2"),
        std.cast("long").alias("std_micro"),
        F.when(std > 0, F.floor(F.lit(1_000_000_000_000) / std))
        .otherwise(0)
        .cast("long")
        .alias("inv_scale_micro"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss sign-projection distortion audit

JL_M = 16  # projected dimensionality (from d=64)
JL_DIMS = 64
JL_PROBES = 48  # fixed probe-set size -> <= C(48,2) audited pairs at ANY corpus size
JL_SCALE = 1_000_000


def _jl_signs(m: int = JL_M, d: int = JL_DIMS) -> list[list[int]]:
    """Deterministic +/-1 projection matrix from md5 — identical on
    both engines because it is EMBEDDED as a literal in each (computed
    once here, driver-side; no RNG state anywhere)."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[:15], 16) % 2 == 0 else -1
            for i in range(d)
        ]
        for j in range(m)
    ]


@query(
    "jl_distortion_audit",
    None,  # assigned below (needs the literal sign matrix)
    tags=("similarity", "linalg", "audit"),
    doc=f"Johnson-Lindenstrauss distortion audit: project d={JL_DIMS} "
    f"embeddings to m={JL_M} dims with a deterministic +/-1 sign "
    f"matrix (the Achlioptas database-friendly JL construction) and "
    f"measure, on a fixed {JL_PROBES}-probe pair set (the ids with "
    f"the smallest md5 keys — CONSTANT size at any corpus scale, like "
    f"cosine_topk's bounded query set), the squared-distance ratio "
    f"proj/(m*orig) in exact ppm — the certificate that the cheap "
    f"{JL_M}-dim sketch preserves geometry before it replaces the "
    f"{JL_DIMS}-dim column in first-pass ANN/dedup at 100 TB (4x "
    f"less shuffle per vector). Exactness: elements truncate to "
    f"int64 micro units (the anisotropy probe's recipe — TRUNC and "
    f"a long cast agree on both engines), so projections, squared "
    f"distances and the final truncating-division ppm are ALL "
    f"integer arithmetic; squared projected sums widen to "
    f"decimal(38,0) (16 x (1e9)^2 exceeds int64). No decimal "
    f"rescaling anywhere — Spark rounds HALF_UP where DuckDB "
    f"truncates on decimal scale-down, so cross-engine-exact code "
    f"must never change a decimal's scale.",
)
def jl_distortion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from porcupine_spark.tables import load_table

    signs = _jl_signs()
    emb = load_table(spark, sf_dir, "embeddings")
    h = (
        F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
        .alias("_h")
    )
    # micro-unit elements: trunc(x * 1e6) as int64 (exact cross-engine)
    xu = F.transform(
        F.col("embedding"), lambda x: (x.cast("double") * 1e6).cast("long")
    ).alias("_xu")
    # deterministic bounded probe set: the JL_PROBES smallest hash keys
    # (TakeOrderedAndProject — no global sort materializes)
    sampled = emb.select("vec_id", xu, h).orderBy("_h", "vec_id").limit(JL_PROBES)
    # projected coordinates: signed int64 sums of micro elements
    proj_cols = [
        F.expr(
            "("
            + " + ".join(
                f"({signs[j][i]}) * element_at(_xu, {i + 1})" for i in range(JL_DIMS)
            )
            + ")"
        ).alias(f"y{j}")
        for j in range(JL_M)
    ]
    p = sampled.select("vec_id", "_xu", *proj_cols)
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    # original squared distance in micro^2 units: 64 x (1.6e7)^2 < 2^63
    d2_orig = F.aggregate(
        F.zip_with(F.col("a._xu"), F.col("b._xu"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # projected squared distance: 16 x (1e9)^2 overflows int64 -> decimal(38,0)
    d2_proj = None
    for j in range(JL_M):
        term = F.expr(
            f"CAST(a.y{j} - b.y{j} AS DECIMAL(38,0)) * CAST(a.y{j} - b.y{j} AS DECIMAL(38,0))"
        )
        d2_proj = term if d2_proj is None else (d2_proj + term)
    out = pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        d2_orig.alias("_o"),
        d2_proj.cast("decimal(38,0)").alias("_p"),
    )
    return out.select(
        "vec_a",
        "vec_b",
        (F.col("_o").cast("double") / F.lit(1e12)).alias("orig_dist2"),
        (F.col("_p").cast("double") / F.lit(1e12)).alias("proj_dist2"),
        F.expr(
            f"CASE WHEN _o = 0 THEN NULL ELSE "
            f"CAST((_p * CAST({JL_SCALE} AS DECIMAL(38,0)))"
            f" div (CAST({JL_M} AS DECIMAL(38,0)) * CAST(_o AS DECIMAL(38,0)))"
            f" AS BIGINT) END"
        ).alias("distortion_ppm"),
    )


def _jl_oracle_sql() -> str:
    signs = _jl_signs()
    proj_exprs = [
        "(" + " + ".join(f"({signs[j][i]}) * xu[{i + 1}]" for i in range(JL_DIMS)) + f") AS y{j}"
        for j in range(JL_M)
    ]
    proj_diff = " + ".join(
        f"CAST(a.y{j} - b.y{j} AS HUGEINT) * CAST(a.y{j} - b.y{j} AS HUGEINT)"
        for j in range(JL_M)
    )
    return f"""
    WITH s AS MATERIALIZED (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(TRUNC(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xu
      FROM embeddings
      QUALIFY row_number() OVER (
        ORDER BY CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 15)) AS BIGINT),
                 vec_id) <= {JL_PROBES}
    ),
    sy AS MATERIALIZED (
      SELECT vec_id, xu, {", ".join(proj_exprs)} FROM s
    ),
    pr AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             CAST(list_sum(list_transform(list_zip(a.xu, b.xu),
               p -> (p[1] - p[2]) * (p[1] - p[2]))) AS HUGEINT) AS o,
             ({proj_diff}) AS p
      FROM sy a JOIN sy b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b,
           CAST(o AS DOUBLE) / 1e12 AS orig_dist2,
           CAST(p AS DOUBLE) / 1e12 AS proj_dist2,
           CASE WHEN o = 0 THEN NULL ELSE
             CAST((p * {JL_SCALE}) // ({JL_M} * o) AS BIGINT) END AS distortion_ppm
    FROM pr
    """


from porcupine_spark.plans.registry import REGISTRY as _REG3  # noqa: E402

_REG3["jl_distortion_audit"].oracle = _jl_oracle_sql()
