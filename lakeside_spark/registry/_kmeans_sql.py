"""DuckDB twin of operators/kmeans_replay: the snapped spherical
k-means as a recursive CTE, shared by the cluster-analytics exact
oracles (embedding_cluster_stats).

1:1 with the Python driver pass: vec_id-ordered sample, strided init,
KM_ITERS fixed iterations; per iteration every sample row takes the
argmax (ties → lowest cell: list_position == np.argmax first-max) of
ORDER-FREE integer dot products, per-cell dimension sums are integer
sums, and the normalize step is the pinned (s9/1e9/cnt)/norm sequence
with norm = sqrt(Σ snap9(v²)/1e9). Empty cells keep the old centroid
via the list_position/COALESCE sparse-fill pattern (list_position
returns 0 when absent; lst[0] is NULL). Dimensions hardcoded to the
64-dim embedding column.
"""

from lakeside_spark.operators.kmeans_replay import KM_ITERS

D = 64

# snapped unit vectors for EVERY corpus row (sample + assignment share)
_UNIT_CTE = f"""
allv AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings
),
au AS MATERIALIZED (
  SELECT vec_id,
    list_transform(range({D}), d ->
      CAST(round((x[d + 1] / nrm) * 1e9) AS BIGINT)) AS u9
  FROM (
    SELECT vec_id, x,
      CASE WHEN nrm0 = 0.0 THEN 1.0 ELSE nrm0 END AS nrm
    FROM (
      SELECT vec_id, x,
        SQRT(CAST(list_sum(list_transform(range({D}), d ->
          CAST(round(x[d + 1] * x[d + 1] * 1e9) AS BIGINT))) AS DOUBLE)
          / 1e9) AS nrm0
      FROM allv
    )
  )
)"""

# integer dot-product list of one u9 row against every centroid slice
_DOTS = (
    f"list_transform(range(sn.kk), c -> "
    f"list_sum(list_transform(range({D}), d -> "
    f"CAST(round((CAST(u9[d + 1] AS DOUBLE) / 1e9) "
    f"* (CAST({{cents}}[c * {D} + d + 1] AS DOUBLE) / 1e9) "
    f"* 1e9) AS BIGINT))))"
)


def kmeans_cte(n_cells: int, train_sample: int) -> str:
    """WITH RECURSIVE prelude exposing ``au`` (snapped unit vectors),
    ``sn`` (effective cell count kk) and ``kmf`` (final centroids)."""
    return f"""
WITH RECURSIVE
{_UNIT_CTE},
samp AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS sid, u9
  FROM (SELECT vec_id, u9 FROM au ORDER BY vec_id LIMIT {train_sample})
),
sn AS MATERIALIZED (
  SELECT COUNT(*) AS n,
         LEAST({n_cells}, COUNT(*)) AS kk,
         GREATEST(COUNT(*) // LEAST({n_cells}, COUNT(*)), 1) AS stride
  FROM samp
),
c0 AS (
  SELECT flatten(list(u9 ORDER BY sid)) AS cents
  FROM samp, sn
  WHERE sid % stride = 0 AND sid // stride < kk
),
km AS (
  SELECT 0 AS k, (SELECT cents FROM c0) AS cents
  UNION ALL
  SELECT k + 1,
    list_transform(range((SELECT kk FROM sn) * {D}), cd ->
      COALESCE(els[list_position(cds, cd)], oldc[cd + 1]))
  FROM (
    SELECT k, any_value(cents) AS oldc,
           list(cd ORDER BY cd) AS cds,
           list(el ORDER BY cd) AS els
    FROM (
      -- one row per (non-empty cell, dim): the updated element,
      -- normalized with the per-cell window norm
      SELECT k, cents, best * {D} + d AS cd,
        CAST(round(((CAST(s9 AS DOUBLE) / 1e9 / cnt)
             / (CASE WHEN nrm0 = 0.0 THEN 1.0 ELSE nrm0 END)) * 1e9)
             AS BIGINT) AS el
      FROM (
        SELECT *, SQRT(CAST(SUM(CAST(round(
                 (CAST(s9 AS DOUBLE) / 1e9 / cnt)
                 * (CAST(s9 AS DOUBLE) / 1e9 / cnt) * 1e9) AS BIGINT))
               OVER (PARTITION BY k, best) AS DOUBLE) / 1e9) AS nrm0
        FROM (
          SELECT k, any_value(cents) AS cents, best, d,
                 SUM(uval) AS s9, COUNT(*) AS cnt
          FROM (
            SELECT k, cents, best, dd.d AS d, u9[dd.d + 1] AS uval
            FROM (
              SELECT k, cents, u9,
                {_DOTS.format(cents="cents")} AS dots,
                list_position(dots, list_aggregate(dots, 'max')) - 1 AS best
              FROM (SELECT k, cents FROM km WHERE k < {KM_ITERS}) it0, samp, sn
            ) asg
            CROSS JOIN (SELECT UNNEST(range({D})) AS d) dd
          ) dimrows
          GROUP BY k, best, d
        ) celldim
      ) celln
    ) sparse
    GROUP BY k
  ) agg
),
kmf AS MATERIALIZED (SELECT cents FROM km WHERE k = {KM_ITERS})"""


# embedding_cluster_stats: assign every corpus vector to its argmax
# cell; the cohesion cosine IS the snapped integer dot (cos9), so the
# aggregates are integer-exact in both engines. Mirrors the operator's
# output (cell, n_vectors, mean_cos, min_cos, keep_rate) with
# target_per_cell = 50 and the registry's n_cells = 16.
EMB_CLUSTER_STATS_SQL = kmeans_cte(16, 10_000) + f"""
, asgall AS (
  SELECT best, dots[list_position(dots, list_aggregate(dots, 'max'))]
           AS cos9
  FROM (
    SELECT {_DOTS.format(cents="f.cents")} AS dots,
           list_position(dots, list_aggregate(dots, 'max')) - 1 AS best
    FROM au, kmf f, sn
  )
)
SELECT CAST(best AS INTEGER) AS cell,
       COUNT(*) AS n_vectors,
       (ROUND(SUM(cos9) / (COUNT(*) * 1e9), 6) + 0.0::DOUBLE) AS mean_cos,
       (ROUND(MIN(cos9) / 1e9, 6) + 0.0::DOUBLE) AS min_cos,
       ROUND(LEAST(1.0::DOUBLE, CAST(50.0 AS DOUBLE) / COUNT(*)), 6)
         AS keep_rate
FROM asgall GROUP BY 1
"""


def semdedup_sql(thr9: int) -> str:
    """SemDeDup twin: the trained quantizer's assignment plus the
    per-cell greedy scan replayed as a LOCKSTEP recursive CTE — all
    cells advance one ascending-vec_id member per step, each new member
    scoring order-free integer dots against the cell's kept-so-far
    flattened unit vectors; keep iff max cos9 < thr9 (the operator's
    integer compare)."""
    return kmeans_cte(16, 10_000) + f"""
, members AS MATERIALIZED (
  SELECT CAST(best AS INTEGER) AS cell, vec_id, u9,
         ROW_NUMBER() OVER (PARTITION BY best ORDER BY vec_id) AS rnk
  FROM (
    SELECT vec_id, u9, {_DOTS.format(cents="f.cents")} AS dots,
           list_position(dots, list_aggregate(dots, 'max')) - 1 AS best
    FROM au, kmf f, sn
  )
),
msz AS (SELECT MAX(rnk) AS mx FROM members),
greedy AS (
  SELECT cell, 0 AS r, []::BIGINT[] AS keptflat,
         CAST(NULL AS BIGINT) AS ovec, CAST(NULL AS BIGINT) AS ocos9,
         FALSE AS okeep
  FROM (SELECT DISTINCT cell FROM members)
  UNION ALL
  SELECT g.cell, g.r + 1,
         CASE WHEN g.mvec IS NOT NULL AND g.mc9 < {thr9}
              THEN g.keptflat || g.mu9 ELSE g.keptflat END,
         g.mvec, g.mc9,
         COALESCE(g.mvec IS NOT NULL AND g.mc9 < {thr9}, FALSE)
  FROM (
    SELECT g0.*, m.vec_id AS mvec, m.u9 AS mu9,
           CASE WHEN m.vec_id IS NULL THEN NULL
                WHEN len(g0.keptflat) = 0 THEN 0
                ELSE list_aggregate(
                  list_transform(range(len(g0.keptflat) // {D}), t ->
                    list_sum(list_transform(range({D}), d ->
                      CAST(round((CAST(m.u9[d + 1] AS DOUBLE) / 1e9)
                           * (CAST(g0.keptflat[t * {D} + d + 1] AS DOUBLE)
                              / 1e9) * 1e9) AS BIGINT)))),
                  'max') END AS mc9
    FROM (SELECT * FROM greedy WHERE r < (SELECT mx FROM msz)) g0
    LEFT JOIN members m ON m.cell = g0.cell AND m.rnk = g0.r + 1
  ) g
)
SELECT ovec AS vec_id, cell,
       (ROUND(CAST(ocos9 AS DOUBLE) / 1e9, 6) + 0.0::DOUBLE)
         AS max_kept_cos
FROM greedy WHERE okeep
"""


SEMDEDUP_SQL = semdedup_sql(400_000_000)  # registry threshold 0.4
