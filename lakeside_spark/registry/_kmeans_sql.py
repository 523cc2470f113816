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


# ann_ivf twin (registry call: n_cells=16, n_probe=6, k=5, queries
# vec_id < 5): the trained snapped quantizer assigns every corpus
# vector to its argmax cell (first-max ties), each query probes its
# top-6 cells by (integer dot desc, cell asc) — the Python side's
# stable argsort — and candidates in probed cells are scored with the
# same order-free 1e-9 integer dot, ranked (cos9 desc, n_id asc).
ANN_IVF_SQL = kmeans_cte(16, 10_000) + f"""
, asg AS MATERIALIZED (
  SELECT vec_id AS n_id, u9,
         list_position(dots, list_aggregate(dots, 'max')) - 1 AS cell
  FROM (
    SELECT vec_id, u9, {_DOTS.format(cents="f.cents")} AS dots
    FROM au, kmf f, sn
  )
),
qprobe AS (
  SELECT q_id, q9, cell FROM (
    SELECT q_id, q9, cc.c AS cell,
           ROW_NUMBER() OVER (PARTITION BY q_id
                              ORDER BY dots[cc.c + 1] DESC, cc.c) AS pr
    FROM (
      SELECT vec_id AS q_id, u9 AS q9,
             {_DOTS.format(cents="f.cents")} AS dots
      FROM au, kmf f, sn
      WHERE vec_id < 5
    ) qd, sn, range(16) cc(c)
    WHERE cc.c < sn.kk
  ) WHERE pr <= 6
),
cand AS (
  SELECT q.q_id, a.n_id,
    list_sum(list_transform(range({D}), d ->
      CAST(round((CAST(q.q9[d + 1] AS DOUBLE) / 1e9)
           * (CAST(a.u9[d + 1] AS DOUBLE) / 1e9) * 1e9) AS BIGINT))) AS cos9
  FROM qprobe q JOIN asg a USING (cell)
  WHERE q.q_id <> a.n_id
),
rk AS (
  SELECT q_id, n_id, cos9,
         ROW_NUMBER() OVER (PARTITION BY q_id
                            ORDER BY cos9 DESC, n_id) AS rank
  FROM cand
)
SELECT q_id, n_id,
       (ROUND(CAST(cos9 AS DOUBLE) / 1e9, 6) + 0.0::DOUBLE) AS cos,
       CAST(rank AS INT) AS rank
FROM rk WHERE rank <= 5
"""


# kmeans_names twin: the driver-side snapped name clustering replayed
# end-to-end — bigram-jaccard feature vectors over the SORTED distinct
# (source/lang) names, one recursive CTE training ALL k in [2, 6] in
# lockstep (state keyed by k, the PQ-subspace trick), assignment by the
# same order-free integer dots, and the k-growth selection (first k
# whose clusters all have < 15 members, else 6) as a FILTERed MIN.
# Output ids are dense_rank over the winning k's cell index — exactly
# the Python side's empty-cell-dropping enumerate. Dims are DYNAMIC
# (nn.n names ≈ 100 at every SF): scalar range(n) inside lambdas is
# fine, only the lateral TABLE function form is restricted.
KMEANS_NAMES_SQL = """
WITH RECURSIVE
names AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY name) - 1 AS nid, name
  FROM (SELECT DISTINCT source || \'/\' || lang AS name FROM documents)
),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM names),
grams AS MATERIALIZED (
  SELECT nid, list_distinct(list_transform(
    range(GREATEST(len(name) - 1, 1)),
    i -> substr(name, CAST(i + 1 AS INT), 2))) AS g
  FROM names
),
fx AS MATERIALIZED (
  -- jaccard feature vector per name, ordered by the other name\'s nid
  SELECT i AS nid, list(x ORDER BY j) AS x
  FROM (
    SELECT a.nid AS i, b.nid AS j,
      CASE WHEN len(list_distinct(a.g || b.g)) = 0 THEN 0.0::DOUBLE
           ELSE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
                / len(list_distinct(a.g || b.g)) END AS x
    FROM grams a, grams b
  ) GROUP BY i
),
au AS MATERIALIZED (
  -- unit9: snapped 1e-9 unit feature vectors (order-free norm)
  SELECT nid,
    list_transform(range(n), d ->
      CAST(round((x[d + 1] / nrm) * 1e9) AS BIGINT)) AS u9
  FROM (
    SELECT nid, x, n,
      CASE WHEN nrm0 = 0.0 THEN 1.0 ELSE nrm0 END AS nrm
    FROM (
      SELECT nid, x, nn.n,
        SQRT(CAST(list_sum(list_transform(range(nn.n), d ->
          CAST(round(x[d + 1] * x[d + 1] * 1e9) AS BIGINT))) AS DOUBLE)
          / 1e9) AS nrm0
      FROM fx, nn
    )
  )
),
kdef AS MATERIALIZED (
  SELECT ks.k AS k, LEAST(ks.k, nn.n) AS kk,
         GREATEST(nn.n // LEAST(ks.k, nn.n), 1) AS stride, nn.n AS n
  FROM (SELECT UNNEST(range(2, 7)) AS k) ks, nn
),
c0 AS (
  SELECT kd.k, flatten(list(a.u9 ORDER BY a.nid)) AS cents
  FROM kdef kd
  JOIN au a ON a.nid % kd.stride = 0 AND a.nid // kd.stride < kd.kk
  GROUP BY kd.k
),
km AS (
  SELECT 0 AS it, k, cents FROM c0
  UNION ALL
  SELECT it + 1, k,
    list_transform(range(kkv * nv), cd ->
      COALESCE(els[list_position(cds, cd)], oldc[cd + 1]))
  FROM (
    SELECT it, k, any_value(kkv) AS kkv, any_value(nv) AS nv,
           any_value(cents) AS oldc,
           list(cd ORDER BY cd) AS cds,
           list(el ORDER BY cd) AS els
    FROM (
      SELECT it, k, kkv, nv, cents, best * nv + d AS cd,
        CAST(round(((CAST(s9 AS DOUBLE) / 1e9 / cnt)
             / (CASE WHEN nrm0 = 0.0 THEN 1.0 ELSE nrm0 END)) * 1e9)
             AS BIGINT) AS el
      FROM (
        SELECT *, SQRT(CAST(SUM(CAST(round(
                 (CAST(s9 AS DOUBLE) / 1e9 / cnt)
                 * (CAST(s9 AS DOUBLE) / 1e9 / cnt) * 1e9) AS BIGINT))
               OVER (PARTITION BY it, k, best) AS DOUBLE) / 1e9) AS nrm0
        FROM (
          SELECT it, k, any_value(kkv) AS kkv, any_value(nv) AS nv,
                 any_value(cents) AS cents, best, d,
                 SUM(uval) AS s9, COUNT(*) AS cnt
          FROM (
            SELECT it, k, kkv, nv, cents, best, dd.d AS d,
                   u9[dd.d + 1] AS uval
            FROM (
              SELECT it, k, kkv, nv, cents, u9,
                list_position(dots, list_aggregate(dots, \'max\')) - 1
                  AS best
              FROM (
                SELECT i0.it, i0.k, kd0.kk AS kkv, kd0.n AS nv,
                  i0.cents, a0.u9,
                  list_transform(range(kd0.kk), c ->
                    list_sum(list_transform(range(kd0.n), d ->
                      CAST(round((CAST(a0.u9[d + 1] AS DOUBLE) / 1e9)
                           * (CAST(i0.cents[c * kd0.n + d + 1]
                                   AS DOUBLE) / 1e9) * 1e9)
                           AS BIGINT)))) AS dots
                FROM (SELECT it, k, cents FROM km WHERE it < 15) i0
                JOIN kdef kd0 USING (k), au a0
              ) drows
            ) asg
            CROSS JOIN (SELECT UNNEST(range((SELECT n FROM nn))) AS d) dd
            WHERE dd.d < nv
          ) dimrows
          GROUP BY it, k, best, d
        ) celldim
      ) celln
    ) sparse
    GROUP BY it, k
  ) agg
),
kmf AS MATERIALIZED (SELECT k, cents FROM km WHERE it = 15),
asg AS MATERIALIZED (
  SELECT k, name,
         list_position(dots, list_aggregate(dots, \'max\')) - 1 AS best
  FROM (
    SELECT f.k, nm.name,
      list_transform(range(kd.kk), c ->
        list_sum(list_transform(range(kd.n), d ->
          CAST(round((CAST(a.u9[d + 1] AS DOUBLE) / 1e9)
               * (CAST(f.cents[c * kd.n + d + 1] AS DOUBLE) / 1e9)
               * 1e9) AS BIGINT)))) AS dots
    FROM kmf f JOIN kdef kd USING (k), au a JOIN names nm USING (nid)
  ) d0
),
ksel AS (
  SELECT COALESCE(MIN(k) FILTER (WHERE mx < 15), 6) AS kch
  FROM (
    SELECT k, MAX(c) AS mx
    FROM (SELECT k, best, COUNT(*) AS c FROM asg GROUP BY 1, 2)
    GROUP BY k
  )
)
SELECT CAST(DENSE_RANK() OVER (ORDER BY best) - 1 AS INT) AS cluster_id,
       name
FROM asg, ksel WHERE asg.k = ksel.kch
"""
