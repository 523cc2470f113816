"""DuckDB twin of operators/eigh_replay: the snapped parallel-Jacobi
eigensolve as a recursive CTE, shared by the EMB_WHITENING /
EMB_PCA_REDUCE exact oracles.

Replay structure (1:1 with the Python driver code — every float op is a
basic IEEE op on identical snapped inputs):
  base/sv/mom : 1e-9 fixed-point covariance moments (integer sums)
  cov/scl/a0  : snapped covariance, power-of-two scaling (exact)
  it          : 504 recursive iterations (8 sweeps × 63 round-robin
                rounds); state = A and V as 4096-entry DOUBLE lists; per
                round 32 disjoint pairs rotate via the closed-form
                tournament schedule (i<63 pairs with (r-i) mod 63, the
                self-paired index with 63, 63 with 32·r mod 63)
  lam/vr      : final eigenvalue integers (1e-12) and eigenvector rows
Dimensions hardcoded to the 64-dim embedding column like every other
embedding oracle.
"""

from lakeside_spark.operators.eigh_replay import D, SWEEPS

ROUNDS = D - 1
ITERS = SWEEPS * ROUNDS  # single source of truth: tuning SWEEPS
# retunes BOTH replays together — a textual mirror here would let the
# two engines silently iterate different counts

_SNAP12 = "round(({x}) * 1e12) / 1e12"

EIGH_CTE = f"""
WITH RECURSIVE
base AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
idx AS (SELECT UNNEST(range({D})) AS i),
nn AS (SELECT COUNT(*) AS n FROM base),
sv AS MATERIALIZED (
  SELECT ii.i AS i,
         SUM(CAST(round(b.x[ii.i + 1] * 1e9) AS HUGEINT)) AS s9
  FROM base b, idx ii GROUP BY 1
),
mom AS MATERIALIZED (
  SELECT ii.i AS i, jj.i AS j,
         SUM(CAST(round(b.x[ii.i + 1] * b.x[jj.i + 1] * 1e9) AS HUGEINT))
           AS g9
  FROM base b, idx ii, idx jj GROUP BY 1, 2
),
mu AS MATERIALIZED (
  SELECT i, CAST(s9 AS DOUBLE) / 1e9 / (SELECT n FROM nn) AS m FROM sv
),
cov AS MATERIALIZED (
  SELECT m0.i, m0.j,
         CAST(round((CAST(m0.g9 AS DOUBLE) / 1e9 / (SELECT n FROM nn)
              - (CAST(si.s9 AS DOUBLE) / 1e9 / (SELECT n FROM nn))
                * (CAST(sj.s9 AS DOUBLE) / 1e9 / (SELECT n FROM nn))) * 1e9)
              AS BIGINT) AS c9
  FROM mom m0 JOIN sv si ON si.i = m0.i JOIN sv sj ON sj.i = m0.j
),
scl AS (
  SELECT POWER(2.0, 29 - GREATEST(length(bin(MAX(ABS(c9)))), 1)) AS sc
  FROM cov
),
a0 AS (
  SELECT list(CAST(c9 AS DOUBLE) / 1e9 * (SELECT sc FROM scl)
              ORDER BY i * {D} + j) AS a
  FROM cov
),
v0 AS (
  SELECT list_transform(range({D * D}),
           ij -> CASE WHEN ij // {D} = ij % {D} THEN 1.0::DOUBLE
                 ELSE 0.0::DOUBLE END) AS v
),
it AS (
  SELECT 0 AS k, (SELECT a FROM a0) AS a, (SELECT v FROM v0) AS v
  UNION ALL
  SELECT k + 1,
    list_transform(range({D * D}), ij ->
      {_SNAP12.format(x=f"co[(ij % {D}) + 1] * b[ij + 1] + ts[(ij % {D}) + 1] * b[(ij // {D}) * {D} + mo[(ij % {D}) + 1] + 1]")}),
    list_transform(range({D * D}), ij ->
      {_SNAP12.format(x=f"co[(ij % {D}) + 1] * v[ij + 1] + ts[(ij % {D}) + 1] * v[(ij // {D}) * {D} + mo[(ij % {D}) + 1] + 1]")})
  FROM (
    SELECT *, list_transform(range({D * D}), ij ->
      {_SNAP12.format(x=f"co[(ij // {D}) + 1] * a[ij + 1] + ts[(ij // {D}) + 1] * a[mo[(ij // {D}) + 1] * {D} + (ij % {D}) + 1]")}) AS b
    FROM (
      SELECT *, list_transform(range({D}), i ->
        CASE WHEN i < mo[i + 1] THEN -so[i + 1] ELSE so[i + 1] END) AS ts
      FROM (
        SELECT *,
          list_transform(range({D}), i ->
            CASE WHEN apq[i + 1] = 0.0 THEN 1.0::DOUBLE
            ELSE {_SNAP12.format(x="1.0 / SQRT(tv[i + 1] * tv[i + 1] + 1.0)")} END) AS co,
          list_transform(range({D}), i ->
            CASE WHEN apq[i + 1] = 0.0 THEN 0.0::DOUBLE
            ELSE {_SNAP12.format(x="tv[i + 1] * (1.0 / SQRT(tv[i + 1] * tv[i + 1] + 1.0))")} END) AS so
        FROM (
          SELECT *, list_transform(range({D}), i ->
            CASE WHEN apq[i + 1] = 0.0 THEN 0.0::DOUBLE
            WHEN th[i + 1] < 0.0
              THEN -(1.0 / (ABS(th[i + 1]) + SQRT(th[i + 1] * th[i + 1] + 1.0)))
            ELSE 1.0 / (ABS(th[i + 1]) + SQRT(th[i + 1] * th[i + 1] + 1.0))
            END) AS tv
          FROM (
            SELECT *, list_transform(range({D}), i ->
              CASE WHEN apq[i + 1] = 0.0 THEN 0.0::DOUBLE
              ELSE (a[GREATEST(i, mo[i + 1]) * {D} + GREATEST(i, mo[i + 1]) + 1]
                    - a[LEAST(i, mo[i + 1]) * {D} + LEAST(i, mo[i + 1]) + 1])
                   / (2.0 * apq[i + 1]) END) AS th
            FROM (
              SELECT *, list_transform(range({D}), i ->
                a[LEAST(i, mo[i + 1]) * {D} + GREATEST(i, mo[i + 1]) + 1]) AS apq
              FROM (
                SELECT *, list_transform(range({D}), i ->
                  CASE WHEN i = {D - 1} THEN (rr * 32) % {ROUNDS}
                       WHEN ((rr - i) % {ROUNDS} + {ROUNDS}) % {ROUNDS} = i
                         THEN {D - 1}
                       ELSE ((rr - i) % {ROUNDS} + {ROUNDS}) % {ROUNDS} END) AS mo
                FROM (
                  SELECT k, a, v, k % {ROUNDS} AS rr
                  FROM it WHERE k < {ITERS}
                ) s0
              ) s1
            ) s2
          ) s3
        ) s4
      ) s5
    ) s6
  ) s7
),
fin AS MATERIALIZED (SELECT a, v FROM it WHERE k = {ITERS}),
lam AS MATERIALIZED (
  SELECT jj.i AS j,
         CAST(round(f.a[jj.i * {D} + jj.i + 1] * 1e12) AS BIGINT) AS l12
  FROM fin f, idx jj
),
vr AS MATERIALIZED (
  SELECT ii.i AS i, jj.i AS j, f.v[ii.i * {D} + jj.i + 1] AS val
  FROM fin f, idx ii, idx jj
)
"""

# ZCA whitening tail: W = U diag(1/sqrt(λ+eps)) Uᵀ via snapped scaled
# columns + order-free integer-snapped matmul, then the per-row
# 1e-9 snapped-product transform. Column sign/order cancel in U f(λ) Uᵀ,
# so raw (j-indexed) eigenpairs are used directly.
EMB_WHITENING_SQL = EIGH_CTE + f"""
, dk AS (
  SELECT j, 1.0 / SQRT(GREATEST(CAST(l12 AS DOUBLE) / 1e12
                                / (SELECT sc FROM scl), 0.0) + 1e-6) AS d
  FROM lam
),
dd AS (
  SELECT v1.i, v1.j, {_SNAP12.format(x="v1.val * dk.d")} AS dval
  FROM vr v1 JOIN dk USING (j)
),
wr AS MATERIALIZED (
  SELECT d1.i AS i, v2.i AS j,
         SUM(CAST(round(d1.dval * v2.val * 1e9) AS BIGINT)) AS w9
  FROM dd d1 JOIN vr v2 ON v2.j = d1.j
  GROUP BY 1, 2
)
SELECT b.vec_id, CAST(w.i AS INTEGER) AS dim,
       (ROUND(CAST(SUM(CAST(round((b.x[w.j + 1] - m.m)
              * (CAST(w.w9 AS DOUBLE) / 1e9) * 1e9) AS BIGINT)) AS DOUBLE)
              / 1e9, 6) + 0.0::DOUBLE) AS val
FROM base b, wr w JOIN mu m ON m.i = w.j
GROUP BY 1, 2
"""

# PCA tail: eigenpairs sorted by (λ12 desc, j asc), sign pinned so the
# largest-|entry| component (smallest index on ties) is positive, EVR a
# ratio of integer eigenvalue sums, projection the same snapped sum.
EMB_PCA_REDUCE_SQL = EIGH_CTE + f"""
, ord AS (
  SELECT j, l12, ROW_NUMBER() OVER (ORDER BY l12 DESC, j ASC) AS rk
  FROM lam
),
sgn AS (
  SELECT j, CASE WHEN FIRST(val ORDER BY ABS(val) DESC, i ASC) < 0.0
            THEN -1.0::DOUBLE ELSE 1.0::DOUBLE END AS fl
  FROM vr GROUP BY j
),
urows AS MATERIALIZED (
  SELECT o.rk - 1 AS jn, v1.i AS kk, v1.val * s.fl AS uval
  FROM vr v1 JOIN ord o ON o.j = v1.j JOIN sgn s ON s.j = v1.j
  WHERE o.rk <= 16
),
evr AS (
  SELECT CASE WHEN (SELECT SUM(l12) FROM lam) <= 0 THEN 0.0::DOUBLE
         ELSE LEAST(GREATEST(
           CAST((SELECT SUM(l.l12) FROM lam l JOIN ord o
                 ON o.j = l.j WHERE o.rk <= 16) AS DOUBLE)
           / CAST((SELECT SUM(l12) FROM lam) AS DOUBLE),
           0.0::DOUBLE), 1.0::DOUBLE) END AS e
)
SELECT b.vec_id, CAST(u.jn AS INTEGER) AS dim,
       (ROUND(CAST(SUM(CAST(round((b.x[u.kk + 1] - m.m) * u.uval * 1e9)
              AS BIGINT)) AS DOUBLE) / 1e9, 6) + 0.0::DOUBLE) AS val,
       (ROUND((SELECT e FROM evr), 6) + 0.0::DOUBLE) AS evr
FROM base b, urows u JOIN mu m ON m.i = u.kk
GROUP BY 1, 2
"""
