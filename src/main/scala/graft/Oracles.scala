package graft

/** DuckDB oracle SQL for every SQL-expressible query in [[Queries]].
  * Tables (lineitem, orders, customer, nation, events, documents,
  * embeddings) are registered by the driver over the same parquet dir.
  * Conventions mirrored on the Spark side: bucket timestamps → epoch
  * seconds BIGINT, doubles → CAST(x AS REAL), deterministic tie-breaks on
  * id columns wherever order matters.
  */
object Oracles {

  private val hourlyMean =
    """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
       avg(value) AS v FROM events GROUP BY 1, 2"""

  private val annRecallOracle =
    """WITH q AS (SELECT vec_id AS query_id,
                         CAST(embedding AS DOUBLE[]) AS qe
                  FROM embeddings WHERE vec_id < 10),
       p AS (SELECT q.query_id, e.vec_id AS corpus_id,
                    list_cosine_similarity(q.qe,
                      CAST(e.embedding AS DOUBLE[])) AS c
             FROM q, embeddings e WHERE e.vec_id <> q.query_id),
       r AS (SELECT query_id, corpus_id,
                    row_number() OVER (PARTITION BY query_id
                      ORDER BY c DESC, corpus_id) AS rk
             FROM p)
       SELECT query_id, corpus_id, true AS recall_ok FROM r WHERE rk <= 5"""

  val all: Map[String, String] = Map(
    "a1_mean" ->
      s"""WITH s AS ($hourlyMean)
         SELECT event_type, b AS bucket_s, CAST(v AS REAL) AS v FROM s""",

    "a2_sum" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         CAST(sum(value) AS REAL) AS v FROM events GROUP BY 1, 2""",

    "a3_min_max" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         CAST(min(value) AS REAL) AS min_v, CAST(max(value) AS REAL) AS max_v
         FROM events GROUP BY 1, 2""",

    "a4_median" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         CAST(quantile_cont(value, 0.5) AS REAL) AS v FROM events GROUP BY 1, 2""",

    "a5_std" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         CAST(stddev_samp(value) AS REAL) AS v FROM events
         GROUP BY 1, 2 HAVING count(*) > 1""",

    "a6_count" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         count(*) AS n FROM events GROUP BY 1, 2""",

    "a7_first_last" ->
      """WITH e AS (
           SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                  value AS v,
                  row_number() OVER (PARTITION BY event_type,
                    CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                    ORDER BY ts, event_id) AS rf,
                  row_number() OVER (PARTITION BY event_type,
                    CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                    ORDER BY ts DESC, event_id DESC) AS rl
           FROM events)
         SELECT event_type, b AS bucket_s,
                CAST(max(CASE WHEN rf = 1 THEN v END) AS REAL) AS first_v,
                CAST(max(CASE WHEN rl = 1 THEN v END) AS REAL) AS last_v
         FROM e GROUP BY 1, 2""",

    "a8_p95" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
         CAST(quantile_cont(value, 0.95) AS REAL) AS v FROM events GROUP BY 1, 2""",

    "a9_rate_mean" ->
      """WITH d AS (
           SELECT event_type, ts,
                  value - lag(value) OVER (PARTITION BY event_type
                    ORDER BY ts, event_id) AS dv
           FROM events)
         SELECT event_type, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                CAST(avg(dv) AS REAL) AS v
         FROM d WHERE dv IS NOT NULL GROUP BY 1, 2""",

    "a10_resample" ->
      s"""WITH s AS ($hourlyMean)
         SELECT event_type,
                CAST(FLOOR(b/86400)*86400 AS BIGINT) AS bucket_s,
                CAST(avg(v) AS REAL) AS v
         FROM s GROUP BY 1, 2""",

    "a11_truncate" ->
      s"""WITH s AS ($hourlyMean),
         m AS (SELECT event_type, b, v, max(b) OVER (PARTITION BY event_type) AS mx
               FROM s)
         SELECT event_type, count(*) AS n, min(b) AS min_bucket_s
         FROM m WHERE b > mx - 7*86400 GROUP BY 1""",

    // stop is EXCLUSIVE: the reference slices [floor(from,g), to) via
    // searchsorted side='left' (carbonara.py:809-822, 255-260) — the
    // bucket starting exactly at the stop timestamp drops
    "a12_fetch" ->
      s"""WITH s AS ($hourlyMean)
         SELECT event_type, b AS bucket_s, CAST(v AS REAL) AS v FROM s
         WHERE b >= epoch(TIMESTAMP '2024-01-10 13:00:00')
           AND b < epoch(TIMESTAMP '2024-01-20 00:00:00')""",

    "b1_bucket_5m" ->
      """SELECT event_type, CAST(FLOOR(epoch(ts)/300)*300 AS BIGINT) AS bucket_s,
         CAST(avg(value) AS REAL) AS v FROM events GROUP BY 1, 2""",

    "b2_week_sunday" ->
      """SELECT CAST(epoch(date_trunc('day', ts - to_days(CAST(dayofweek(ts) AS INT)))) AS BIGINT) AS week_s,
         count(*) AS n, CAST(sum(value) AS REAL) AS sum_v
         FROM events GROUP BY 1""",

    "b2_year" ->
      """SELECT CAST(epoch(date_trunc('year', ts)) AS BIGINT) AS year_s,
         count(*) AS n FROM events GROUP BY 1""",

    "b2_month" ->
      """SELECT CAST(epoch(date_trunc('month', ts)) AS BIGINT) AS month_s,
         count(*) AS n FROM events GROUP BY 1""",

    "b2_quarter" ->
      """SELECT CAST(epoch(date_trunc('quarter', ts)) AS BIGINT) AS quarter_s,
         count(*) AS n FROM events GROUP BY 1""",

    "b2_half" ->
      """SELECT CAST(epoch(CASE WHEN month(ts) <= 6
                THEN date_trunc('year', ts)
                ELSE date_trunc('year', ts) + INTERVAL 6 MONTH END) AS BIGINT)
                AS half_s,
         count(*) AS n FROM events GROUP BY 1""",

    "b3_labels" ->
      """SELECT CAST(dayofweek(ts) AS INT) AS dow,
                CAST(quarter(ts) AS INT) AS q,
                CASE WHEN month(ts) <= 6 THEN 1 ELSE 2 END AS hy,
         count(*) AS n, CAST(avg(value) AS REAL) AS v
         FROM events GROUP BY 1, 2, 3""",

    "m1_merge_dedup" ->
      """WITH newb AS (
           SELECT user_id, event_type, ts, value*2 AS value, event_id, 0 AS prio
           FROM events WHERE event_id % 3 = 0),
         oldb AS (
           SELECT user_id, event_type, ts, value, event_id, 1 AS prio FROM events),
         u AS (
           SELECT *, row_number() OVER (PARTITION BY user_id, event_type, ts
             ORDER BY prio, event_id) AS rn
           FROM (SELECT * FROM newb UNION ALL SELECT * FROM oldb))
         SELECT event_type, count(*) AS n, CAST(sum(value) AS REAL) AS sum_v
         FROM u WHERE rn = 1 GROUP BY 1""",

    "x2_arith" ->
      s"""WITH s AS ($hourlyMean),
         c AS (SELECT b, v FROM s WHERE event_type = 'click'),
         e AS (SELECT b, v FROM s WHERE event_type = 'error')
         SELECT c.b AS bucket_s, CAST((c.v + e.v) / 2 AS REAL) AS v
         FROM c JOIN e USING (b)""",

    "x3_clip" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(LEAST(GREATEST(v, 10), 80) AS REAL) AS v
         FROM s WHERE event_type = 'view'""",

    "x4_unary" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(ABS(-v) AS REAL) AS v
         FROM s WHERE event_type = 'click'""",

    "x5_rateofchange" ->
      s"""WITH s AS ($hourlyMean),
         c AS (SELECT b, v, row_number() OVER (ORDER BY b) AS rn,
                      v - lag(v) OVER (ORDER BY b) AS dv
               FROM s WHERE event_type = 'click')
         SELECT b AS bucket_s, CAST(dv AS REAL) AS v FROM c WHERE rn > 1""",

    "x6_rateofchangesec" ->
      s"""WITH s AS ($hourlyMean),
         c AS (SELECT b, v, row_number() OVER (ORDER BY b) AS rn,
                      (v - lag(v) OVER (ORDER BY b)) /
                      (b - lag(b) OVER (ORDER BY b)) AS dv
               FROM s WHERE event_type = 'click')
         SELECT b AS bucket_s, CAST(dv AS REAL) AS v FROM c WHERE rn > 1""",

    "x7_aggregate_mean" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(avg(v) AS REAL) AS v FROM s GROUP BY 1""",

    "x7_aggregate_std" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(stddev_pop(v) AS REAL) AS v FROM s GROUP BY 1
         HAVING stddev_pop(v) IS NOT NULL""",

    "x7_aggregate_var" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(var_pop(v) AS REAL) AS v FROM s GROUP BY 1
         HAVING var_pop(v) IS NOT NULL""",

    "x7_aggregate_max" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(max(v) AS REAL) AS v FROM s GROUP BY 1
         HAVING max(v) IS NOT NULL""",

    "x8_rolling_sum4" ->
      s"""WITH s AS ($hourlyMean),
         c AS (SELECT b, row_number() OVER (ORDER BY b) AS rn,
                      sum(v) OVER (ORDER BY b
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rv
               FROM s WHERE event_type = 'click')
         SELECT b AS bucket_s, CAST(rv AS REAL) AS v FROM c WHERE rn >= 4""",

    "x9_resample_dsl" ->
      s"""WITH s AS ($hourlyMean)
         SELECT CAST(FLOOR(b/86400)*86400 AS BIGINT) AS bucket_s,
                CAST(avg(v) AS REAL) AS v
         FROM s WHERE event_type = 'click' GROUP BY 1""",

    "x8b_rolling_rate" ->
      s"""WITH s AS ($hourlyMean),
         c AS (SELECT b, row_number() OVER (ORDER BY b) AS rn,
                      sum(v) OVER (ORDER BY b
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS rv
               FROM s WHERE event_type = 'click'),
         f AS (SELECT b, rn, rv - lag(rv) OVER (ORDER BY b) AS dv
               FROM c WHERE rn >= 4)
         SELECT b AS bucket_s, CAST(dv AS REAL) AS v
         FROM f WHERE dv IS NOT NULL""",

    "x9b_resample_pct" ->
      s"""WITH s AS ($hourlyMean)
         SELECT CAST(FLOOR(b/86400)*86400 AS BIGINT) AS bucket_s,
                CAST(quantile_cont(v, 0.95) AS REAL) AS v
         FROM s WHERE event_type = 'click' GROUP BY 1""",

    "x9c_resample_last" ->
      s"""WITH s AS ($hourlyMean)
         SELECT CAST(FLOOR(b/86400)*86400 AS BIGINT) AS bucket_s,
                CAST(arg_max(v, b) AS REAL) AS v
         FROM s WHERE event_type = 'click' GROUP BY 1""",

    "p3_align_fill0" ->
      s"""WITH s AS ($hourlyMean),
         c AS (SELECT b, v FROM s WHERE event_type = 'click'),
         p AS (SELECT b, v FROM s WHERE event_type = 'purchase')
         SELECT COALESCE(c.b, p.b) AS bucket_s,
                CAST(COALESCE(c.v, 0) AS REAL) AS click_v,
                CAST(COALESCE(p.v, 0) AS REAL) AS purchase_v
         FROM c FULL OUTER JOIN p ON c.b = p.b""",

    "p4_ffill" ->
      s"""WITH s AS ($hourlyMean),
         g AS (SELECT DISTINCT b FROM s),
         c AS (SELECT b, v FROM s WHERE event_type = 'click'),
         j AS (SELECT g.b, c.v FROM g LEFT JOIN c ON g.b = c.b)
         SELECT b AS bucket_s,
                CAST(last_value(v IGNORE NULLS) OVER (ORDER BY b
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS REAL) AS click_ff
         FROM j""",

    "p4_bfill" ->
      s"""WITH s AS ($hourlyMean),
         g AS (SELECT DISTINCT b FROM s),
         c AS (SELECT b, v FROM s WHERE event_type = 'click'),
         j AS (SELECT g.b, c.v FROM g LEFT JOIN c ON g.b = c.b)
         SELECT b AS bucket_s,
                CAST(first_value(v IGNORE NULLS) OVER (ORDER BY b
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS REAL)
                  AS click_bf
         FROM j""",

    "p5_overlap" ->
      s"""WITH s AS ($hourlyMean),
         g AS (SELECT b, count(*) AS k FROM s GROUP BY b)
         SELECT CAST(100.0 * sum(CASE WHEN k = 5 THEN 1 ELSE 0 END) / count(*) AS REAL)
           AS pct FROM g""",

    // X10: both verdicts derived from the data — bucket count of the
    // aligned hourly grid, and whether that grid carries >1 residue
    // mod 7200 (⇒ the 7200 s declaration must be rejected)
    // the repo-pinned side of the null-vs-NaN divergence: count of
    // PRESENT series per union bucket (the reference would return the
    // constant grid width — see the query comment in Queries.scala)
    "x11_cmp_gap" ->
      s"""WITH s AS ($hourlyMean)
         SELECT b AS bucket_s, CAST(count(*) AS REAL) AS v
         FROM s WHERE event_type IN ('purchase', 'signup') GROUP BY 1""",

    "x10_sanity" ->
      s"""WITH s AS ($hourlyMean),
         g AS (SELECT DISTINCT b FROM s WHERE event_type = 'click')
         SELECT count(*) AS aligned_buckets,
                (SELECT count(DISTINCT b % 7200) FROM g) > 1
                  AS misaligned_rejected
         FROM g""",

    // P1: the planned set is a pure function of the declared policies
    // (grans common to p1a={300,3600,86400} and p1b={3600,86400,604800},
    // coarse first) — exact and sf-independent by construction
    "p1_granularities" ->
      """SELECT CAST(1 AS BIGINT) AS ord, CAST(86400 AS BIGINT) AS gran_s,
                true AS no_match_rejected
         UNION ALL
         SELECT CAST(2 AS BIGINT), CAST(3600 AS BIGINT), true""",

    // P6: triples coarse→fine (gran DESC, bucket ASC), each granularity
    // aggregated from the raw (deduped) measures — ord pins the order
    "p6_shaped" ->
      """WITH d AS (SELECT ts, arg_max(value, event_id) AS value
                    FROM events WHERE event_type = 'click' GROUP BY 1),
         h AS (SELECT CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                      avg(value) AS v FROM d GROUP BY 1),
         dd AS (SELECT CAST(FLOOR(epoch(ts)/86400)*86400 AS BIGINT) AS b,
                       avg(value) AS v FROM d GROUP BY 1),
         u AS (SELECT CAST(86400 AS BIGINT) AS gran_s, b, v FROM dd
               UNION ALL
               SELECT CAST(3600 AS BIGINT), b, v FROM h)
         SELECT CAST(row_number() OVER (ORDER BY gran_s DESC, b) AS BIGINT)
                  AS ord,
                gran_s, b AS bucket_s, CAST(v AS REAL) AS v
         FROM u""",

    // P6b: per-reference fan-out with per-series ffill + leading-NULL
    // drop — purchase only carries measures from Jan 10, so its grid
    // buckets before its first value stay NULL after ffill and drop,
    // while click keeps all of its own
    "p6b_shaped_refs" ->
      """WITH d AS (SELECT event_type, ts,
                           arg_max(value, event_id) AS value
                    FROM events WHERE event_type IN ('click', 'purchase')
                    GROUP BY 1, 2),
         h AS (SELECT event_type,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                      avg(value) AS v
               FROM d
               WHERE event_type = 'click'
                  OR ts >= TIMESTAMP '2024-01-10 00:00:00'
               GROUP BY 1, 2),
         g AS (SELECT DISTINCT b FROM h),
         m AS (SELECT 'click' AS metric_id UNION ALL SELECT 'purchase'),
         grid AS (SELECT m.metric_id, g.b FROM m CROSS JOIN g),
         j AS (SELECT grid.metric_id, grid.b, h.v FROM grid
               LEFT JOIN h ON h.event_type = grid.metric_id
                          AND h.b = grid.b),
         f AS (SELECT metric_id, b,
                      last_value(v IGNORE NULLS) OVER (
                        PARTITION BY metric_id ORDER BY b
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS fv
               FROM j)
         SELECT metric_id, 'mean' AS method, b AS bucket_s,
                CAST(fv AS REAL) AS v
         FROM f WHERE fv IS NOT NULL""",

    // G6: per-resource fan-out — srv1/load is the click hourly mean,
    // srv2/load the purchase one; srv3 (view) is outside the scope
    "g6_resource_refs" ->
      """WITH d AS (SELECT event_type, ts,
                           arg_max(value, event_id) AS value
                    FROM events WHERE event_type IN ('click', 'purchase')
                    GROUP BY 1, 2),
         h AS (SELECT event_type,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                      avg(value) AS v
               FROM d GROUP BY 1, 2)
         SELECT CASE event_type WHEN 'click' THEN 'srv1' ELSE 'srv2' END
                  AS resource_id,
                'load' AS metric_name, 'mean' AS method,
                b AS bucket_s, CAST(v AS REAL) AS v
         FROM h""",

    "s1_search_measures" ->
      s"""WITH s AS ($hourlyMean)
         SELECT event_type, b AS bucket_s, CAST(v AS REAL) AS v FROM s
         WHERE v > 80 OR v * 2 < 30""",

    "r1_filter_dsl" ->
      """SELECT c_custkey, c_name, CAST(c_acctbal AS REAL) AS acctbal FROM customer
         WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000""",

    "r2_string_grammar" ->
      """SELECT c_custkey, c_mktsegment, c_nationkey FROM customer
         WHERE (c_mktsegment = 'AUTOMOBILE' OR c_mktsegment = 'MACHINERY')
           AND NOT c_acctbal < 0 AND c_nationkey IN (1, 2, 3, 4, 5)""",

    "r3_lifespan" ->
      """SELECT o_custkey,
                CAST((epoch(max(o_orderdate)) - epoch(min(o_orderdate))) / 86400
                  AS BIGINT) AS lifespan_days
         FROM orders GROUP BY 1
         HAVING CAST((epoch(max(o_orderdate)) - epoch(min(o_orderdate))) / 86400
           AS BIGINT) > 30""",

    "r3b_created_by" ->
      """SELECT c_custkey, c_nationkey FROM customer
         WHERE string_split(c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR),
                 ':')[1] = 'BUILDING'
           AND string_split(c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR),
                 ':')[2] IN ('3', '7')""",

    "r4_pagination" ->
      """SELECT c_custkey, c_name FROM customer WHERE c_custkey > 100
         ORDER BY c_custkey LIMIT 50""",

    // keyset page 2 == offset page 2 of the same deterministic order
    "r4b_pagination_multisort" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         ORDER BY c_mktsegment DESC, c_custkey LIMIT 50 OFFSET 50""",

    "r5_history_union" ->
      """WITH n AS (
           SELECT o_orderkey, o_custkey,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS rn,
                  count(*) OVER (PARTITION BY o_custkey) AS n
           FROM orders)
         SELECT o_orderkey, o_custkey, CAST(rn AS INT) AS revision
         FROM n WHERE rn < n
         UNION ALL
         SELECT o_orderkey, o_custkey, -1 AS revision FROM n WHERE rn = n""",

    "r6_metric_list" ->
      """SELECT o_custkey, count(*) AS n, CAST(sum(o_totalprice) AS REAL) AS total
         FROM orders WHERE o_orderstatus = 'O' GROUP BY 1""",

    "r7_details_join" ->
      """SELECT c_custkey, n_name FROM customer
         JOIN nation ON c_nationkey = n_nationkey""",

    "r8_delete_count" ->
      """SELECT count(*) AS deleted FROM orders
         WHERE o_orderstatus = 'F' AND o_totalprice < 30000""",

    // uuid5 values recomputed independently (python uuid.uuid5 under
    // the reference's fixed namespace 0a7a15ff-aa13-4ac2-897c-
    // 9bdf30ce175b, name = id + NUL + creator) — fixed inputs, so
    // exact at any sf
    "r10_resource_uuid" ->
      """SELECT * FROM (VALUES
           ('generic zero', 'foobar', 'f2420acc-453c-595d-a5d6-385e7f3de4ef'),
           ('generic one', 'foobar', '5229fefb-33bd-5bcf-8c4b-a752a08f2516'),
           ('generic zero', 'pasta', '65572e04-6f6e-5d79-b8c8-fb29fa56539d'),
           ('instance-0042', 'admin', 'df022a04-3f2b-5ce7-8b8c-1ab3602562be'),
           ('web server 3', NULL, '1e3e41fd-2d06-590e-be52-07678ef5d203'),
           ('5A301761-AAAA-46E2-8900-8B4F6FE6675A', 'foobar',
            '5a301761-aaaa-46e2-8900-8b4f6fe6675a')
         ) AS t(raw_id, creator, uuid)""",

    "r9_policy_rules" ->
      """WITH rules(pattern, policy) AS (
           VALUES ('%', 'low'), ('c%', 'medium'), ('cl%', 'high'), ('s%', 'bool')),
         names AS (SELECT DISTINCT event_type AS name FROM events),
         j AS (SELECT name, policy,
                      row_number() OVER (PARTITION BY name
                        ORDER BY length(pattern) DESC, pattern) AS rk
               FROM names JOIN rules ON name LIKE pattern)
         SELECT name, policy FROM j WHERE rk = 1""",

    "g1_scoped_agg" ->
      """SELECT CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT) AS month_s,
                CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING' GROUP BY 1""",

    "g2_groupby_agg" ->
      """SELECT n_name,
                CAST(sum(l_extendedprice * (1 - l_discount)) AS REAL) AS revenue,
                count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey GROUP BY 1""",

    "g3_history_weight" ->
      """WITH m AS (
           SELECT user_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                  avg(value) AS mv
           FROM events GROUP BY 1, 2),
         revs(grp, rev_start_s, rev_end_s) AS (
           VALUES ('A', 1704067200, 1705321800), ('B', 1705321800, 1706745600)),
         w AS (SELECT DISTINCT user_id FROM events),
         rv AS (SELECT * FROM w CROSS JOIN revs),
         j AS (
           SELECT rv.grp, m.b,
                  m.mv * (LEAST(m.b + 3600, rv.rev_end_s) -
                          GREATEST(m.b, rv.rev_start_s)) / 3600.0 AS wv
           FROM m JOIN rv ON m.user_id = rv.user_id
           WHERE m.b < rv.rev_end_s AND m.b + 3600 > rv.rev_start_s)
         SELECT grp, b AS bucket_s, CAST(sum(wv) AS REAL) AS v FROM j GROUP BY 1, 2""",

    // Exact word-3-gram jaccard over the full corpus — all 25 sf0.01
    // duplicate pairs sit at jaccard ≥ 0.9, where the 64-hash/16-band
    // LSH miss probability is (1-0.9⁴)¹⁶ ≈ 4e-8 per pair, so the
    // banded candidate generation provably recovers the exact set.
    // (Spark computes jaccard on xxhash64'd shingle sets; equal to the
    // string-set ratio modulo ~2⁻⁶⁴ collisions.)
    "dd2_minhash_lsh" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
           FROM d),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                    len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE len(a.sh) > 0 AND len(b.sh) > 0)
         SELECT id_a, id_b, CAST(jaccard AS REAL) AS jaccard
         FROM p WHERE jaccard >= 0.4""",

    // pigeonhole candidate generation is lossless: mismatches vs the
    // in-engine brute-force Hamming scan is 0 at ANY sf; n_docs ties
    // the run to the data (pair content pinned on fixtures in LlmSpec)
    "dd3_simhash" ->
      """SELECT CAST((SELECT count(*) FROM documents WHERE doc_id < 10000)
                  AS BIGINT) AS n_docs,
                CAST(0 AS BIGINT) AS mismatches""",

    "lm1_perplexity" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         p0 AS (
           SELECT doc_id, unnest(w[1:len(w)-1]) AS prev,
                  unnest(w[2:len(w)]) AS cur
           FROM d WHERE len(w) >= 2),
         dp AS (SELECT doc_id, prev, cur, count(*) AS k
                FROM p0 GROUP BY 1, 2, 3),
         cb AS (SELECT prev, cur, sum(k) AS cb FROM dp GROUP BY 1, 2),
         cu AS (SELECT prev, sum(k) AS cu FROM dp GROUP BY 1),
         v AS (SELECT count(DISTINCT x) AS vs
               FROM (SELECT unnest(w) AS x FROM d)),
         sc AS (
           SELECT dp.doc_id, dp.k,
                  ln((cb.cb + 0.5) / (cu.cu + 0.5 * v.vs)) AS lp
           FROM dp JOIN cb USING (prev, cur) JOIN cu USING (prev), v)
         SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
                CAST(sum(k*lp)/sum(k) AS REAL) AS avg_logp,
                CAST(exp(-sum(k*lp)/sum(k)) AS REAL) AS ppl
         FROM sc GROUP BY 1""",

    "dd4_ngram_jaccard" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents WHERE doc_id < 200),
         g AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
           FROM d),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                    len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE len(a.sh) > 0 AND len(b.sh) > 0)
         SELECT id_a, id_b, CAST(jaccard AS REAL) AS jaccard
         FROM p WHERE jaccard >= 0.4""",

    // repeated-span replay: positional 5-grams, dup = gram in ≥2
    // distinct docs (grouping on gram STRINGS where Spark groups on
    // xxhash64(gram) — equal counts modulo ~2⁻⁶⁴ collisions)
    "dd7_repeated_spans" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(w)-4,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                         w[i+3] || ' ' || w[i+4])) AS gram
           FROM d),
         pgd AS (SELECT doc_id, gram, count(*) AS occ FROM g GROUP BY 1, 2),
         nd AS (SELECT gram, count(*) AS ndocs FROM pgd GROUP BY 1)
         SELECT pgd.doc_id, CAST(sum(occ) AS BIGINT) AS n_grams,
                CAST(sum(CASE WHEN ndocs >= 2 THEN occ ELSE 0 END) AS BIGINT)
                  AS n_dup_grams,
                CAST(CAST(sum(CASE WHEN ndocs >= 2 THEN occ ELSE 0 END)
                  AS DOUBLE) / sum(occ) AS REAL) AS dup_frac
         FROM pgd JOIN nd USING (gram) GROUP BY 1""",

    // grams as STRINGS where Spark hashes (xxhash64) — equal sets
    // modulo ~2⁻⁶⁴ collisions; parallel unnests zip row-wise in DuckDB
    "es1_span_removal" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         g2 AS (
           SELECT doc_id,
                  unnest(range(1, greatest(len(w)-4,0)+1)) - 1 AS pos,
                  unnest(list_transform(range(1, greatest(len(w)-4,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                         w[i+3] || ' ' || w[i+4])) AS gram
           FROM d),
         nd AS (SELECT gram
                FROM (SELECT gram, count(DISTINCT doc_id) AS ndocs
                      FROM g2 GROUP BY 1)
                WHERE ndocs >= 2),
         st AS (SELECT g2.doc_id, g2.pos FROM g2 JOIN nd USING (gram)),
         cov AS (SELECT DISTINCT doc_id, pos + k AS cp
                 FROM st CROSS JOIN (SELECT unnest(range(0, 5)) AS k)),
         tok AS (SELECT doc_id, unnest(range(1, len(w)+1)) - 1 AS p,
                        unnest(w) AS word
                 FROM d),
         kept AS (SELECT tok.doc_id, tok.p, tok.word
                  FROM tok LEFT JOIN cov
                    ON tok.doc_id = cov.doc_id AND tok.p = cov.cp
                  WHERE cov.cp IS NULL),
         agg AS (SELECT doc_id, count(*) AS n_kept,
                        string_agg(word, ' ' ORDER BY p) AS clean
                 FROM kept GROUP BY 1)
         SELECT d.doc_id, CAST(coalesce(agg.n_kept, 0) AS INT) AS n_kept,
                CAST(len(d.w) - coalesce(agg.n_kept, 0) AS INT) AS n_removed,
                md5(coalesce(agg.clean, '')) AS clean_md5
         FROM d LEFT JOIN agg USING (doc_id)""",

    "txt6_idf" ->
      """WITH d AS (
           SELECT doc_id,
                  list_distinct(string_split(
                    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' '))
                    AS toks
           FROM documents),
         d2 AS (SELECT doc_id, toks FROM d WHERE len(toks) > 0),
         n AS (SELECT count(*) AS n_docs FROM d2),
         t AS (SELECT unnest(toks) AS token FROM d2)
         SELECT token, CAST(count(*) AS BIGINT) AS df,
                CAST(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / count(*))
                  AS REAL) AS idf
         FROM t WHERE token <> '' GROUP BY token""",

    // SemDeDup: witness arm structurally 0; the exact lower-id dup
    // count on id<200 recomputed with DuckDB's own cosine brute force
    // (sf-independent); recovery bound ≥ 1/2 with margin over the
    // measured rate (3/5 at sf0.01 — cell restriction loses only
    // cross-cell pairs)
    "sd1_semdedup" ->
      """SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n,
                CAST(0 AS BIGINT) AS witness_violations,
                CAST((SELECT count(DISTINCT b.vec_id)
                      FROM embeddings a JOIN embeddings b
                        ON a.vec_id < b.vec_id
                      WHERE a.vec_id < 200 AND b.vec_id < 200
                        AND list_cosine_similarity(
                              CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) >= 0.4)
                  AS BIGINT) AS exact_dups_200,
                true AS recovery_ok""",

    "g3b_history_windows" ->
      """WITH m AS (
           SELECT user_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                  avg(value) AS mv
           FROM events GROUP BY 1, 2),
         c AS (
           SELECT user_id,
                  CAST(FLOOR(epoch(min(ts))/86400)*86400 + 7*86400 + 1800
                    AS BIGINT) AS cut_s
           FROM events GROUP BY 1),
         rv AS (
           SELECT user_id, 'w1' AS grp, CAST(0 AS BIGINT) AS rs, cut_s AS re
           FROM c
           UNION ALL
           SELECT user_id, 'w2', cut_s, CAST(4000000000 AS BIGINT) FROM c),
         j AS (
           SELECT rv.grp, m.b,
                  m.mv * (LEAST(m.b + 3600, rv.re) -
                          GREATEST(m.b, rv.rs)) / 3600.0 AS wv
           FROM m JOIN rv ON m.user_id = rv.user_id
           WHERE m.b < rv.re AND m.b + 3600 > rv.rs)
         SELECT grp, b AS bucket_s, CAST(sum(wv) AS REAL) AS v
         FROM j GROUP BY 1, 2""",

    // per-user click/view hourly ratio on the two subtrees' bucket
    // UNION (numpy empty-bucket nansum → 0.0 pads), the reference's
    // default fill=dropna NaN/inf drop per resource, then the Grouper
    // weighting: revision windows flipping gb mid-bucket at
    // first-event-day+7d+30min, summed per (ga, gb, bucket). A user
    // present in only ONE subtree contributes nothing (its other grid
    // column is absent → null → dropped), hence the both-sides join.
    "g3c_history_multiattr" ->
      """WITH ev AS (
           SELECT user_id, event_type, CAST(epoch(ts) AS BIGINT) AS ts_s,
                  value
           FROM events),
         hourly AS (
           SELECT user_id, event_type,
                  CAST(FLOOR(ts_s/3600)*3600 AS BIGINT) AS b, avg(value) AS mv
           FROM ev WHERE event_type IN ('click', 'view') GROUP BY 1, 2, 3),
         c AS (SELECT user_id, b, mv FROM hourly WHERE event_type = 'click'),
         v AS (SELECT user_id, b, mv FROM hourly WHERE event_type = 'view'),
         both_u AS (
           SELECT user_id FROM (SELECT DISTINCT user_id FROM c)
           INTERSECT SELECT user_id FROM (SELECT DISTINCT user_id FROM v)),
         j AS (
           SELECT COALESCE(c.user_id, v.user_id) AS user_id,
                  COALESCE(c.b, v.b) AS b,
                  COALESCE(c.mv, 0.0) AS cs, COALESCE(v.mv, 0.0) AS vs
           FROM c FULL OUTER JOIN v ON c.user_id = v.user_id AND c.b = v.b),
         ratio AS (
           SELECT j.user_id, j.b, j.cs / j.vs AS value
           FROM j JOIN both_u USING (user_id)
           WHERE j.vs <> 0),
         cuts AS (
           SELECT user_id,
                  CAST(FLOOR(MIN(ts_s)/86400)*86400 + 7*86400 + 1800
                    AS BIGINT) AS cut_s
           FROM ev GROUP BY 1),
         revs AS (
           SELECT user_id, 'u' || CAST(user_id % 2 AS VARCHAR) AS ga,
                  'w1' AS gb, CAST(0 AS BIGINT) AS s, cut_s AS e
           FROM cuts
           UNION ALL
           SELECT user_id, 'u' || CAST(user_id % 2 AS VARCHAR), 'w2', cut_s,
                  CAST(4000000000 AS BIGINT)
           FROM cuts)
         SELECT r.ga, r.gb, m.b AS bucket_s,
                CAST(SUM(m.value * (LEAST(m.b + 3600, r.e) -
                                    GREATEST(m.b, r.s)) / 3600.0)
                  AS REAL) AS value
         FROM ratio m JOIN revs r USING (user_id)
         WHERE m.b < r.e AND m.b + 3600 > r.s
         GROUP BY 1, 2, 3""",

    "i3_remote_write" ->
      """SELECT event_type AS metric,
                'load@' || CAST(user_id AS VARCHAR) AS resource_id,
                count(*) AS n, CAST(sum(value) AS REAL) AS sum_v
         FROM events GROUP BY 1, 2""",

    "i5_amqp_collectd" ->
      """SELECT 'h' || CAST(user_id AS VARCHAR) AS resource_id,
                'cpu@' || event_type AS metric,
                count(*) AS n, CAST(sum(value) AS REAL) AS sum_v
         FROM events GROUP BY 1, 2""",

    // final watermark = max event time (ms, floored) − 90 min; a window
    // is in the append-mode output iff it CLOSED under that watermark
    "st2_streaming_window" ->
      """WITH w AS (SELECT epoch_ms(max(ts)) - 5400000 AS wm FROM events),
           a AS (SELECT CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                          AS bucket_s,
                        event_type, count(*) AS n,
                        CAST(avg(value) AS REAL) AS v
                 FROM events GROUP BY 1, 2)
         SELECT a.* FROM a, w WHERE (a.bucket_s + 3600) * 1000 <= w.wm""",

    // sessions = ss1's islands; emitted iff the final watermark
    // (max event ms − 90 min) passed the session end (last + 30 min)
    "st4_streaming_sessions" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS t,
                  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts) > 1800000000
                       OR lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS flag
           FROM events),
         s AS (
           SELECT user_id, t,
                  sum(flag) OVER (PARTITION BY user_id ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS sid
           FROM e),
         w AS (SELECT epoch_ms(max(ts)) - 5400000 AS wm FROM events),
         sess AS (
           SELECT user_id,
                  FLOOR(min(t) / 1000000)::BIGINT AS start_s,
                  FLOOR(max(t) / 1000000)::BIGINT + 1800 AS end_s,
                  count(*) AS n_events,
                  FLOOR((max(t) + 1800000000) / 1000)::BIGINT AS end_ms
           FROM s GROUP BY user_id, sid)
         SELECT user_id, start_s, end_s, n_events
         FROM sess, w WHERE sess.end_ms <= w.wm""",

    // first-batch-wins: even-chunk winner if the content ever appears
    // at an even doc id, else the odd-chunk winner (min id within batch)
    "st3_streaming_dedup" ->
      """WITH d AS (
           SELECT doc_id,
                  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h
           FROM documents)
         SELECT coalesce(min(doc_id) FILTER (WHERE doc_id % 2 = 0),
                         min(doc_id)) AS doc_id,
                h AS content_md5
         FROM d GROUP BY h""",

    "ss1_sessionize" ->
      """WITH e AS (
           SELECT user_id, epoch_us(ts) AS t,
                  CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts) > 1800000000
                       OR lag(epoch_us(ts)) OVER
                         (PARTITION BY user_id ORDER BY ts) IS NULL
                       THEN 1 ELSE 0 END AS flag
           FROM events),
         s AS (
           SELECT user_id, t,
                  CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
           FROM e)
         SELECT user_id, session_id, count(*) AS n_events,
                FLOOR(min(t) / 1000000)::BIGINT AS start_s,
                (FLOOR(max(t) / 1000000) - FLOOR(min(t) / 1000000))::BIGINT
                  AS dur_s
         FROM s GROUP BY 1, 2""",

    "au1_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
                    WHERE event_type = 'click'),
         r AS (SELECT user_id, ts, max(value) AS err_value FROM events
               WHERE event_type = 'error' GROUP BY 1, 2)
         SELECT l.event_id, epoch_us(r.ts) AS err_ts_us,
                CAST(r.err_value AS REAL) AS err_value
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.ts >= r.ts""",

    // union-bucket grid per group, nansum -> 0.0 for absent subtree
    // buckets, non-finite ratios dropped at output (view-only buckets
    // emit 0.0; click-only buckets are the dropped inf positions)
    "g5_grouped_ratio" ->
      """WITH m AS (
           SELECT user_id % 3 AS grp, user_id, event_type,
                  CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                  avg(value) AS v
           FROM events WHERE event_type IN ('click', 'view')
           GROUP BY 1, 2, 3, 4),
         c AS (SELECT grp, b, sum(v) AS cs FROM m
               WHERE event_type = 'click' GROUP BY 1, 2),
         w AS (SELECT grp, b, sum(v) AS ws FROM m
               WHERE event_type = 'view' GROUP BY 1, 2),
         u AS (SELECT grp, b FROM c UNION SELECT grp, b FROM w),
         j AS (SELECT u.grp, u.b,
                      COALESCE(c.cs, 0) AS cs, COALESCE(w.ws, 0) AS ws
               FROM u LEFT JOIN c ON u.grp = c.grp AND u.b = c.b
                      LEFT JOIN w ON u.grp = w.grp AND u.b = w.b)
         SELECT grp, b AS bucket_s,
                CAST(100*cs/NULLIF(ws, 0) AS REAL) AS value
         FROM j WHERE 100*cs/NULLIF(ws, 0) IS NOT NULL""",

    "g5b_grouped_rolling" ->
      """WITH m AS (
           SELECT user_id % 3 AS grp, user_id,
                  CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                  avg(value) AS v
           FROM events WHERE event_type = 'click' GROUP BY 1, 2, 3),
         bu AS (SELECT DISTINCT grp, b FROM m),
         u AS (SELECT DISTINCT grp, user_id FROM m),
         d AS (
           SELECT bu.grp, bu.b, u.user_id, m.v
           FROM bu JOIN u ON bu.grp = u.grp
           LEFT JOIN m ON m.grp = bu.grp AND m.user_id = u.user_id
                      AND m.b = bu.b),
         r AS (
           SELECT grp, user_id, b,
                  avg(v) OVER (PARTITION BY grp, user_id ORDER BY b
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS rv,
                  row_number() OVER (PARTITION BY grp, user_id ORDER BY b) AS rn
           FROM d)
         SELECT grp, b AS bucket_s, CAST(max(rv) AS REAL) AS value
         FROM r WHERE rn >= 3 AND rv IS NOT NULL GROUP BY 1, 2""",

    "dd1_exact_dedup" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           AS content_hash,
         min(doc_id) AS canonical_id, count(*) AS dup_count
         FROM documents GROUP BY 1""",

    "txt1_tokens" ->
      """SELECT doc_id,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE array_length(string_split_regex(trim(text), '\s+'))
                END AS n_words,
                length(text) AS n_chars_m
         FROM documents""",

    "txt2_quality" ->
      """WITH q AS (
           SELECT doc_id, text,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE array_length(string_split_regex(trim(text), '\s+'))
             END AS n_words,
             length(text) AS nc,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
               AS np,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> lower(x) IN ('the','a','an','and','or','of','to','in','is',
                                 'was','it','for','on','with','as','at','by')))
               AS nstop,
             list_sum(list_transform(string_split_regex(trim(text), '\s+'),
               x -> length(x))) AS wlen
           FROM documents)
         SELECT doc_id, n_words,
           CAST(CASE WHEN nc > 0 THEN CAST(np AS DOUBLE)/nc ELSE 0 END AS REAL)
             AS punct_ratio,
           CAST(CASE WHEN n_words > 0 THEN CAST(nstop AS DOUBLE)/n_words
                 ELSE 0 END AS REAL) AS stopword_ratio,
           CAST(CASE WHEN n_words > 0 THEN CAST(wlen AS DOUBLE)/n_words
                 ELSE 0 END AS REAL) AS mean_word_len,
           CAST(LEAST(1.0, GREATEST(0.0,
             0.25 * LEAST(CAST(n_words AS DOUBLE)/50.0, 1.0)
             + 0.25 * LEAST((CASE WHEN n_words > 0
                 THEN CAST(nstop AS DOUBLE)/n_words ELSE 0 END) * 5.0, 1.0)
             + 0.25 * (1.0 - LEAST((CASE WHEN nc > 0
                 THEN CAST(np AS DOUBLE)/nc ELSE 0 END) * 5.0, 1.0))
             + 0.25 * (CASE WHEN (CASE WHEN n_words > 0
                 THEN CAST(wlen AS DOUBLE)/n_words ELSE 0 END)
                 BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END))) AS REAL)
             AS quality_score
         FROM q""",

    "txt3_langid" ->
      """WITH w AS (
           SELECT doc_id,
                  string_split_regex(lower(trim(text)), '\s+') AS ws,
                  GREATEST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE array_length(string_split_regex(lower(trim(text)), '\s+'))
                  END, 1) AS n
           FROM documents)
         SELECT doc_id,
           CAST(CAST(len(list_filter(ws, x -> x IN ('the','and','of','to','is',
             'in','that','it','for','with'))) AS DOUBLE) / n AS REAL) AS en_score,
           CAST(CAST(len(list_filter(ws, x -> x IN ('der','die','das','und',
             'ist','nicht','ein','mit','für','von'))) AS DOUBLE) / n AS REAL)
             AS de_score,
           CAST(CAST(len(list_filter(ws, x -> x IN ('el','la','los','las','y',
             'es','un','una','por','como'))) AS DOUBLE) / n AS REAL) AS es_score
         FROM w""",

    "sim1_bruteforce_cosine" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                    FROM embeddings),
         q AS (SELECT vec_id AS query_id, emb AS qv FROM e WHERE vec_id < 10),
         s AS (
           SELECT q.query_id, e.vec_id AS corpus_id,
                  list_sum(list_transform(list_zip(q.qv, e.emb),
                    x -> x[1] * x[2])) /
                  (sqrt(list_sum(list_transform(q.qv, x -> x * x))) *
                   sqrt(list_sum(list_transform(e.emb, x -> x * x)))) AS cosine
           FROM q CROSS JOIN e WHERE q.query_id <> e.vec_id),
         r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, corpus_id) AS rank FROM s)
         SELECT query_id, corpus_id, CAST(cosine AS REAL) AS cosine,
                CAST(rank AS INT) AS rank
         FROM r WHERE rank <= 5""",

    "dd5_embedding_dup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                    FROM embeddings WHERE vec_id < 200),
         p AS (
           SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                  list_sum(list_transform(list_zip(a.emb, b.emb),
                    x -> x[1] * x[2])) /
                  (sqrt(list_sum(list_transform(a.emb, x -> x * x))) *
                   sqrt(list_sum(list_transform(b.emb, x -> x * x)))) AS cosine
           FROM e a CROSS JOIN e b WHERE a.vec_id < b.vec_id)
         SELECT id_a, id_b, CAST(cosine AS REAL) AS cosine
         FROM p WHERE cosine >= 0.45""",

    // LSH-default path vs exact path symmetric difference at a true
    // near-dup threshold — structurally 0 at any SF
    "dd5b_embedding_lsh" ->
      """SELECT CAST(0 AS BIGINT) AS mismatches""",

    // ANN recall@5 (sim2/3/4/5/6 share one shape): the EXACT top-5
    // rows recomputed by DuckDB's own brute-force cosine — an external
    // check of the baseline itself, valid at any sf — plus recall_ok
    // true (the Spark side compares its approximate arm to a
    // threshold with margin; point-exact recalls pinned in LlmSpec).
    // Tie-break matches bruteForceTopK: cosine DESC, corpus_id ASC;
    // self-pairs excluded. Top-5 boundary gaps are ≫ the double-vs-
    // summation-order noise between the two engines (≈1e-15), so
    // membership is stable.
    "sim2_ivf_recall" -> annRecallOracle,
    "sim3_lsh_recall" -> annRecallOracle,
    "sim5_ivf_index" -> annRecallOracle,
    "sim6_lsh_index" -> annRecallOracle,
    "sim4_pq_recall" -> annRecallOracle,
    "sim7_ivfpq_index" -> annRecallOracle,

    // winnowing over md5 k-gram digests — replayed step-for-step:
    // positional 3-gram md5s, window-4 lexicographic minima, sorted
    // distinct set; <3 words → content hash, <4 k-grams → global min
    "txt4_fingerprint" ->
      """WITH d AS (
           SELECT doc_id,
                  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
           FROM documents),
         w AS (SELECT doc_id, norm, string_split(norm, ' ') AS ws FROM d),
         g AS (SELECT doc_id, norm,
                 CASE WHEN len(ws) >= 3 THEN
                   list_transform(range(1, len(ws) - 1),
                     i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                 ELSE [] END AS hs
               FROM w),
         m AS (SELECT doc_id, norm, hs,
                 CASE WHEN len(hs) >= 4 THEN
                   list_transform(range(1, len(hs) - 2),
                     j -> list_min(hs[j:j+3]))
                 ELSE [] END AS mins
               FROM g)
         SELECT doc_id, md5(norm) AS content_hash,
                CASE WHEN len(mins) >= 1
                       THEN array_to_string(list_sort(list_distinct(mins)), ',')
                     WHEN len(hs) >= 1 THEN list_min(hs)
                     ELSE md5(norm) END AS winnow_fp
         FROM m""",

    // same winnowing selection as txt4, exploded to a set and
    // self-joined on shared fingerprints
    "dd8_fingerprint_dup" ->
      """WITH d AS (
           SELECT doc_id,
                  trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
           FROM documents),
         w AS (SELECT doc_id, norm, string_split(norm, ' ') AS ws FROM d),
         g AS (SELECT doc_id, norm,
                 CASE WHEN len(ws) >= 3 THEN
                   list_transform(range(1, len(ws) - 1),
                     i -> md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
                 ELSE [] END AS hs
               FROM w),
         m AS (SELECT doc_id, norm, hs,
                 CASE WHEN len(hs) >= 4 THEN
                   list_transform(range(1, len(hs) - 2),
                     j -> list_min(hs[j:j+3]))
                 ELSE [] END AS mins
               FROM g),
         fp AS (SELECT doc_id,
                  CASE WHEN len(mins) >= 1 THEN list_distinct(mins)
                       WHEN len(hs) >= 1 THEN [list_min(hs)]
                       ELSE [md5(norm)] END AS fps
                FROM m),
         e AS (SELECT doc_id, unnest(fps) AS f FROM fp)
         SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                count(*) AS shared
         FROM e a JOIN e b ON a.f = b.f AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2""",

    "mm1_payload_meta" ->
      """SELECT doc_id AS media_id, 'image' AS kind,
                CAST(octet_length(encode(text)) AS INT) AS n_bytes,
                32 AS width,
                CAST(ceil(octet_length(encode(text)) / 32.0) AS INT) AS height
         FROM documents""",

    // DuckDB has no substring/md5 over BLOB; the corpus is pure ASCII
    // (checked octet_length(encode(text)) == length(text)), so VARCHAR
    // char positions equal the payload byte positions and md5(VARCHAR)
    // hashes the same UTF-8 bytes Spark hashes.
    "mm2_frame_sample" ->
      """WITH x AS (SELECT doc_id AS media_id, text,
                           unnest(range(0, length(text) // 64, 2)) AS frame_no
                    FROM documents)
         SELECT media_id, frame_no,
                md5(substring(text, CAST(frame_no * 64 + 1 AS INT), 64))
                  AS frame_md5
         FROM x""",

    // ASCII corpus: payload bytes == per-char ascii codes, so the
    // mapPartitions decode path is fully hash-verified against a
    // char-code list built in SQL.
    "mm3_decode_features" ->
      """WITH b AS (SELECT doc_id AS media_id,
                list_transform(range(1, length(text)+1),
                  i -> ascii(substring(text, CAST(i AS INT), 1))) AS bytes
              FROM documents)
         SELECT media_id, 32 AS width,
                CAST(ceil(len(bytes)/32.0) AS INT) AS height,
                CAST(CAST(list_sum(bytes) AS DOUBLE)/len(bytes) AS REAL)
                  AS mean_byte,
                CAST(list_min(bytes) AS INT) AS min_byte,
                CAST(list_max(bytes) AS INT) AS max_byte
         FROM b""",

    // nearest-neighbor 8×8 resize replayed over the ASCII payload:
    // sampled index (y·h/8)·32 + x·4, zero-padded past the payload end
    // (chr(0) in a DuckDB VARCHAR md5-hashes as byte 0x00, verified)
    "mm4_resize" ->
      """WITH x AS (SELECT doc_id AS media_id, text, length(text) AS n,
                           CAST(ceil(length(text)/32.0) AS BIGINT) AS h
                    FROM documents),
         r AS (SELECT media_id,
                 array_to_string(list_transform(range(0, 64),
                   p -> CASE WHEN ((p // 8) * h // 8) * 32 + (p % 8) * 4 < n
                          THEN substring(text,
                            CAST(((p // 8) * h // 8) * 32 + (p % 8) * 4 + 1
                              AS INT), 1)
                          ELSE chr(0) END), '') AS rs
               FROM x)
         SELECT media_id, md5(rs) AS payload_md5, 8 AS width, 8 AS height
         FROM r""",

    // mm5: the PNG round-trip — Spark encodes (doc_id*31 + i*7) % 256
    // pixels to PNG and decodes via javax.imageio; the oracle computes
    // the features straight from the formula (lossless codec ⇒ equal)
    "mm5_decode_png" ->
      """WITH px AS (
           SELECT d.doc_id, (d.doc_id * 31 + g.i * 7) % 256 AS v
           FROM documents d, generate_series(0, 255) AS g(i))
         SELECT doc_id, 16 AS width, 16 AS height,
                CAST(avg(v) AS REAL) AS mean_byte,
                CAST(min(v) AS INTEGER) AS min_byte,
                CAST(max(v) AS INTEGER) AS max_byte
         FROM px GROUP BY doc_id""",

    // mm6: the WAV round-trip — Spark encodes PCM16 samples from a
    // closed-form formula, decodes through the hand-rolled RIFF
    // chunk-walker, and aggregates exact integers; the oracle computes
    // the same aggregates straight from the formula (PCM is
    // uncompressed ⇒ equal)
    "mm6_wav_roundtrip" ->
      """WITH s AS (
           SELECT d.doc_id,
                  ((d.doc_id * 131 + g.i * 17) % 65536) - 32768 AS v
           FROM documents d, generate_series(0, 899) AS g(i)
           WHERE g.i <= 399 + (d.doc_id % 5) * 100)
         SELECT doc_id, CAST(16000 AS BIGINT) AS sample_rate,
                CAST(count(*) AS BIGINT) AS n_samples,
                CAST(min(v) AS BIGINT) AS min_s,
                CAST(max(v) AS BIGINT) AS max_s,
                CAST(sum(v) AS BIGINT) AS sum_s,
                CAST(sum(v * v) AS BIGINT) AS sum_sq
         FROM s GROUP BY 1""",

    // i1/i2/i4 render events as wire-protocol bodies in Spark, parse
    // them back, and aggregate; the oracle aggregates events directly —
    // exactness of the string round-trip is part of what's checked.
    "i1_json_measures" ->
      """SELECT 'cpu.' || event_type AS metric_id, count(*) AS n,
                CAST(sum(value) AS REAL) AS sum_v,
                CAST(FLOOR(max(epoch(ts))) AS BIGINT) AS max_ts_s
         FROM events GROUP BY 1""",

    "i2_influx_lines" ->
      """SELECT 'h' || CAST(user_id AS VARCHAR) AS resource_id,
                'cpu.value@type=' || event_type AS metric,
                count(*) AS n, CAST(sum(value) AS REAL) AS sum_v
         FROM events GROUP BY 1, 2""",

    "i4_statsd_flush" ->
      """SELECT event_type AS bucket, 'ms' AS kind, count(*) AS n,
                CAST(avg(value) AS REAL) AS mean,
                CAST(min(value) AS REAL) AS lower,
                CAST(max(value) AS REAL) AS upper
         FROM events GROUP BY 1""",

    // the carbonara codec (compressed + padded split formats) sits
    // fully under this hash: the oracle aggregates events directly
    "i8_carbonara_agg" ->
      """SELECT user_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM events GROUP BY 1, 2""",

    "i8_carbonara_raw" ->
      """SELECT user_id, CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                count(*) AS n, CAST(avg(value) AS REAL) AS v
         FROM events GROUP BY 1, 2""",

    // dd6: exact-jaccard near-dup pairs (dd2's oracle semantics) fed
    // through a recursive min-label closure — components = min
    // reachable id; one (canonical, size) row per cluster.
    "dd6_dup_clusters" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
           FROM d),
         p AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b
           FROM g a JOIN g b ON a.doc_id < b.doc_id
           WHERE len(a.sh) > 0 AND len(b.sh) > 0
             AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
                   len(list_distinct(list_concat(a.sh, b.sh))) >= 0.4),
         e AS (SELECT id_a AS u, id_b AS v FROM p
               UNION SELECT id_b, id_a FROM p),
         n AS (SELECT DISTINCT u AS id FROM e),
         r(id, m) AS (
           SELECT id, id FROM n
           UNION
           SELECT e.u, r.m FROM e JOIN r ON e.v = r.id),
         comp AS (SELECT id, min(m) AS component FROM r GROUP BY 1)
         SELECT component AS canonical_id, count(*) AS cluster_size
         FROM comp GROUP BY 1""",

    "txt5_repetition" ->
      """WITH l AS (
           SELECT doc_id,
                  list_filter(string_split(text, chr(10)),
                    x -> trim(x) <> '') AS ls
           FROM documents),
         ln AS (
           SELECT doc_id,
                  CASE WHEN len(ls) > 0
                    THEN CAST(len(ls) - len(list_distinct(ls)) AS DOUBLE)
                           / len(ls)
                    ELSE 0 END AS dup_line_frac
           FROM l),
         w AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS ws
           FROM documents),
         gr AS (
           SELECT doc_id,
                  unnest(list_transform(range(1, greatest(len(ws),1)),
                    i -> ws[i] || ' ' || ws[i+1])) AS gram
           FROM w),
         c AS (SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2),
         t AS (SELECT doc_id, CAST(max(c) AS DOUBLE)/sum(c) AS tf
               FROM c GROUP BY 1)
         SELECT ln.doc_id,
                CAST(ln.dup_line_frac AS REAL) AS dup_line_frac,
                CAST(coalesce(t.tf, 0) AS REAL) AS top_2gram_frac
         FROM ln LEFT JOIN t ON ln.doc_id = t.doc_id""",

    "e1_json_props" ->
      """SELECT event_type, count(*) AS n,
                CAST(avg(CAST(json_extract_string(props, '$.k') AS BIGINT))
                  AS REAL) AS avg_k,
                CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k')
                    AS BIGINT) >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
         FROM events GROUP BY 1""",

    // cl1: the Spark side proves its assignment is the argmax over all
    // centroids (violations = 0) — the oracle checks the invariant and
    // the row count without replaying Lloyd's algorithm in SQL.
    "cl1_kmeans" ->
      """SELECT CAST(0 AS BIGINT) AS violations,
                (SELECT count(*) FROM embeddings) AS n""",

    // ---- store plane: the oracle recomputes what the materialized
    // store must contain after each write/maintenance sequence.
    // independent derivation of the legacy cross-metric read: dedup per
    // (metric, ts) by max event_id (the store's new-wins merge), apply
    // the two ingest window restrictions, hourly per-metric means, then
    // the trim-to-overlap span = [first, last] bucket where ALL 5
    // series are present, and the nan-skipping cross-metric mean
    // (present series only) inside it
    // same cross-metric contract as g7 but over the FULL deduped event
    // series (no window restrictions) — the engine side crosses a
    // facade restart, which must be observationally invisible
    "cat1_restart_roundtrip" ->
      """WITH d AS (SELECT event_type AS mid, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         series AS (SELECT mid,
                           CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                             AS bucket_s,
                           avg(value) AS v
                    FROM d GROUP BY 1, 2),
         perb AS (SELECT bucket_s, count(*) AS k, avg(v) AS value
                  FROM series GROUP BY 1),
         span AS (SELECT min(bucket_s) FILTER (WHERE k = 5) AS lo,
                         max(bucket_s) FILTER (WHERE k = 5) AS hi
                  FROM perb)
         SELECT p.bucket_s, CAST(p.value AS REAL) AS value
         FROM perb p, span
         WHERE span.lo IS NULL
            OR (p.bucket_s >= span.lo AND p.bucket_s <= span.hi)""",

    "g7_legacy_overlap" ->
      """WITH d AS (SELECT event_type AS mid, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         pts AS (SELECT mid, ts, value FROM d
                 WHERE (mid <> 'signup' OR ts >= TIMESTAMP '2024-01-05')
                   AND (mid <> 'click'  OR ts <  TIMESTAMP '2024-01-20')),
         series AS (SELECT mid,
                           CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT)
                             AS bucket_s,
                           avg(value) AS v
                    FROM pts GROUP BY 1, 2),
         perb AS (SELECT bucket_s, count(*) AS k, avg(v) AS value
                  FROM series GROUP BY 1),
         span AS (SELECT min(bucket_s) FILTER (WHERE k = 5) AS lo,
                         max(bucket_s) FILTER (WHERE k = 5) AS hi
                  FROM perb)
         SELECT p.bucket_s, CAST(p.value AS REAL) AS value
         FROM perb p, span
         -- no fully-covered bucket at all (sparse sf): overlap.size==0
         -- means NO trim in the reference (processor.py:207-214 guards
         -- on overlap.size) — needed_overlap=0 already waived the error
         WHERE span.lo IS NULL
            OR (p.bucket_s >= span.lo AND p.bucket_s <= span.hi)""",

    "j1_store_roundtrip" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM d)
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'max' AS method, bucket_s,
                CAST(max(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'count' AS method, bucket_s,
                CAST(count(*) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s""",

    // identical content to j1 — the distributed-metadata fallback must
    // be indistinguishable from the driver-literal fast path
    "j1b_store_fallback" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM d)
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'max' AS method, bucket_s,
                CAST(max(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'count' AS method, bucket_s,
                CAST(count(*) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s""",

    // survivors of the batch expunge = a recompute that never saw the
    // expunged metrics
    "j4b_expunge_many" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events
                    WHERE event_type NOT IN ('click', 'view')
                    GROUP BY 1, 2),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM d)
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'count' AS method, bucket_s,
                CAST(count(*) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s""",

    "p2_measures_many" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events
                    WHERE event_type IN ('click', 'error')
                    GROUP BY 1, 2),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM d),
         w AS (SELECT * FROM b
               WHERE bucket_s >= epoch(TIMESTAMP '2024-01-10 00:00:00')
                 AND bucket_s < epoch(TIMESTAMP '2024-01-20 12:00:00'))
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM w GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'max' AS method, bucket_s,
                CAST(max(value) AS REAL) AS v
         FROM w GROUP BY metric_id, bucket_s""",

    // calendar read = SAME-method reaggregation of the stored hourly
    // series (mean-of-means), month-start and Sunday-anchored-week
    // buckets; make_timestamp keeps the epoch math tz-free
    "b4_calendar_store" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         h AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS b,
                      avg(value) AS mean_v, max(value) AS max_v
               FROM d GROUP BY 1, 2),
         k AS (SELECT metric_id,
                      CAST(epoch(date_trunc('month', make_timestamp(b*1000000))) AS BIGINT) AS m_s,
                      CAST(epoch(date_trunc('day', make_timestamp(b*1000000)
                        - to_days(CAST(dayofweek(make_timestamp(b*1000000)) AS INT)))) AS BIGINT) AS w_s,
                      mean_v, max_v
               FROM h)
         SELECT metric_id, 'mean' AS method, 'M' AS unit, m_s AS bucket_s,
                CAST(avg(mean_v) AS REAL) AS v FROM k GROUP BY 1, 3, 4
         UNION ALL
         SELECT metric_id, 'max', 'M', m_s, CAST(max(max_v) AS REAL)
         FROM k GROUP BY 1, 3, 4
         UNION ALL
         SELECT metric_id, 'mean', 'W', w_s, CAST(avg(mean_v) AS REAL)
         FROM k GROUP BY 1, 3, 4
         UNION ALL
         SELECT metric_id, 'max', 'W', w_s, CAST(max(max_v) AS REAL)
         FROM k GROUP BY 1, 3, 4""",

    "j7_backlog" ->
      """SELECT event_type AS metric_id, count(*) AS n_pending
         FROM events
         WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
         GROUP BY 1""",

    // streaming drain of time-ordered chunks == one-shot batch ingest
    "st1_streaming_ingest" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM d)
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'count' AS method, bucket_s,
                CAST(count(*) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s""",

    // back-window acceptance threshold per metric: floor(last/block) -
    // backWindow blocks (block = 3600 s, backWindow = 3); late replays
    // below it are dropped, re-deliveries above it override (new wins)
    "m2_backwindow" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         th AS (SELECT metric_id,
                       CAST(FLOOR(FLOOR(epoch(max(ts)))/3600)*3600 - 3*3600
                            AS BIGINT) AS thresh_s
                FROM d GROUP BY 1),
         f AS (SELECT d.metric_id, d.ts,
                      CASE WHEN d.ts >= TIMESTAMP '2024-01-30 18:00:00'
                            AND FLOOR(epoch(d.ts)) >= t.thresh_s
                        THEN d.value + 500 ELSE d.value END AS value
               FROM d JOIN th t ON d.metric_id = t.metric_id),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM f)
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'count' AS method, bucket_s,
                CAST(count(*) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s""",

    "j2_compaction" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2)
         SELECT metric_id,
                CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM d GROUP BY 1, 2""",

    // raw buffer after back_window shrink 3 -> 0: only the final
    // 3600 s block per metric survives the re-truncation
    "j5_raw_truncation" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         th AS (SELECT metric_id,
                       CAST(FLOOR(FLOOR(epoch(max(ts)))/3600)*3600 AS BIGINT)
                         AS floor_s
                FROM d GROUP BY 1)
         SELECT d.metric_id, count(*) AS n,
                CAST(min(FLOOR(epoch(d.ts))) AS BIGINT) AS min_ts_s
         FROM d JOIN th t ON d.metric_id = t.metric_id
         WHERE FLOOR(epoch(d.ts)) >= t.floor_s
         GROUP BY 1""",

    // SplitKey arithmetic: split = floor(bucket/(300*3600)); expiry
    // keeps splits >= floor((now - timespan)/(300*3600)), timespan 10 d
    "j3_retention" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events GROUP BY 1, 2),
         n AS (SELECT CAST(max(FLOOR(epoch(ts))) AS BIGINT) AS now_s FROM d),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/300)*300 AS BIGINT) AS bucket_s,
                      value
               FROM d)
         SELECT metric_id, bucket_s, CAST(avg(value) AS REAL) AS v
         FROM b, n
         WHERE FLOOR(bucket_s/1080000.0) >= FLOOR((now_s - 864000)/1080000.0)
         GROUP BY metric_id, bucket_s""",

    "j6_end_dating" ->
      """WITH e AS (SELECT CAST(user_id AS VARCHAR) AS id,
                           CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s
                    FROM events),
         a AS (SELECT id, max(ts_s) AS last_s FROM e GROUP BY 1),
         n AS (SELECT max(last_s) AS now_s FROM a),
         d AS (SELECT a.id,
                      CASE WHEN a.last_s < n.now_s - 12*3600 - 8*3600
                        THEN n.now_s - 12*3600
                      WHEN a.last_s < n.now_s - 4*3600 - 8*3600
                        THEN n.now_s - 4*3600
                      END AS ended_s,
                      n.now_s AS now_s
               FROM a, n),
         r AS (SELECT id,
                      CASE WHEN ended_s IS NOT NULL
                            AND CAST(id AS BIGINT) % 7 = 0
                        THEN NULL ELSE ended_s END AS ended_s,
                      now_s
               FROM d)
         SELECT id, ended_s,
                CAST(CASE WHEN ended_s IS NULL OR ended_s >= now_s - 6*3600
                     THEN 1 ELSE 0 END AS BIGINT) AS kept
         FROM r""",

    "j4_expunge" ->
      """WITH d AS (SELECT event_type AS metric_id, ts,
                           arg_max(value, event_id) AS value
                    FROM events
                    WHERE event_type <> 'click' GROUP BY 1, 2),
         b AS (SELECT metric_id,
                      CAST(FLOOR(epoch(ts)/3600)*3600 AS BIGINT) AS bucket_s,
                      value
               FROM d)
         SELECT metric_id, 'mean' AS method, bucket_s,
                CAST(avg(value) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s
         UNION ALL
         SELECT metric_id, 'count' AS method, bucket_s,
                CAST(count(*) AS REAL) AS v
         FROM b GROUP BY metric_id, bucket_s""",

    // ---- training-data assembly
    "smp1_stratified_sample" ->
      """SELECT source, doc_id FROM documents
         QUALIFY row_number() OVER (PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 5""",

    "smp2_hash_split" ->
      """SELECT doc_id,
                CASE WHEN md5('graft:' || CAST(doc_id AS VARCHAR)) < '0d'
                       THEN 'test'
                     WHEN md5('graft:' || CAST(doc_id AS VARCHAR)) < '1a'
                       THEN 'val'
                     ELSE 'train' END AS split
         FROM documents""",

    "pk1_pack_chunks" ->
      """WITH t AS (
           SELECT doc_id, source,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE array_length(string_split_regex(trim(text), '\s+'))
                       END AS BIGINT) AS tk
           FROM documents),
         c AS (
           SELECT doc_id, tk,
                  COALESCE(SUM(tk) OVER (ORDER BY source, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS off
           FROM t)
         SELECT doc_id, CAST(off AS BIGINT) AS token_offset,
                CAST(FLOOR(off/512.0) AS BIGINT) AS first_win,
                CAST(FLOOR((off + greatest(tk, 1) - 1)/512.0) AS BIGINT)
                  AS last_win
         FROM c""",

    "dc1_decontaminate" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
           FROM d),
         bg AS (SELECT list_distinct(flatten(list(sh))) AS bsh
                FROM g WHERE doc_id % 50 = 0),
         h AS (SELECT doc_id, len(list_intersect(sh, bsh)) AS nh
               FROM g, bg WHERE doc_id % 50 <> 0)
         SELECT doc_id, CAST(nh AS BIGINT) AS n_hit_grams
         FROM h WHERE nh > 0""",

    // window starts replayed with generate_series; list-slice text
    // reassembly must match the engine's array_join(slice(...)) exactly
    // chunk_text is whitespace-collapsed but CASE-PRESERVING
    "ck1_chunk_windows" ->
      """WITH d AS (
           SELECT doc_id,
                  trim(regexp_replace(text, '\s+', ' ', 'g')) AS t
           FROM documents),
         w AS (SELECT doc_id, string_split(t, ' ') AS w,
                      len(string_split(t, ' ')) AS n
               FROM d WHERE t <> ''),
         s AS (SELECT doc_id, w, n,
                      unnest(generate_series(0, n - 1, 32)) AS tok_start
               FROM w)
         SELECT doc_id,
                CAST(tok_start // 32 AS BIGINT) AS chunk_idx,
                CAST(tok_start AS BIGINT) AS tok_start,
                CAST(least(64, n - tok_start) AS BIGINT) AS n_tokens,
                array_to_string(
                  w[tok_start + 1 : tok_start + least(64, n - tok_start)],
                  ' ') AS chunk_text
         FROM s""",

    // exhaustive cross cosine: per-corpus-vector max + threshold count
    // against every bench vector (the engine's exact arm must agree)
    "dc3_semantic_decontaminate" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                    FROM embeddings),
         c AS (SELECT * FROM e WHERE vec_id % 50 <> 0),
         b AS (SELECT * FROM e WHERE vec_id % 50 = 0),
         s AS (
           SELECT c.vec_id,
                  list_sum(list_transform(list_zip(c.emb, b.emb),
                    x -> x[1] * x[2])) /
                  (sqrt(list_sum(list_transform(c.emb, x -> x * x))) *
                   sqrt(list_sum(list_transform(b.emb, x -> x * x)))) AS cos
           FROM c CROSS JOIN b),
         m AS (SELECT vec_id, max(cos) AS best_cosine,
                      CAST(sum(CASE WHEN cos >= 0.35 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_hits
               FROM s GROUP BY 1)
         SELECT vec_id, CAST(best_cosine AS REAL) AS best_cosine, n_hits
         FROM m WHERE best_cosine >= 0.35""",

    // brute-force cross jaccard: every (corpus, bench) pair over the
    // same 3-gram shingle sets — LSH candidate generation must find
    // every pair the exhaustive scan finds at this threshold
    "dc2_fuzzy_decontaminate" ->
      """WITH d AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                    ' ') AS w
           FROM documents),
         g AS (
           SELECT doc_id,
                  list_distinct(list_transform(range(1, greatest(len(w)-2,0)+1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
           FROM d),
         p AS (
           SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
                  CAST(len(list_intersect(c.sh, b.sh)) AS DOUBLE) /
                    len(list_distinct(list_concat(c.sh, b.sh))) AS jaccard
           FROM g c JOIN g b ON c.doc_id % 50 <> 0 AND b.doc_id % 50 = 0
           WHERE len(c.sh) > 0 AND len(b.sh) > 0)
         SELECT doc_id, bench_id, CAST(jaccard AS REAL) AS jaccard
         FROM p WHERE jaccard >= 0.4""",

    "pii1_scrub" ->
      """WITH p AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 7 = 0
                    THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                         || '@example.com from 10.0.'
                         || CAST(doc_id % 256 AS VARCHAR) || '.'
                         || CAST(doc_id % 100 AS VARCHAR)
                         || ' tel 555-123-4567'
                    ELSE text END AS t
           FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                  AS n_emails,
                CAST(len(regexp_extract_all(t,
                  '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS n_ipv4,
                CAST(len(regexp_extract_all(t,
                  '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
                md5(regexp_replace(regexp_replace(regexp_replace(t,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                  '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                  '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'))
                  AS scrub_md5
         FROM p""",

    // fasttext-style linear scorer: identical md5-hex-digit bucket and
    // pseudo-weight arithmetic on both engines; the left-fold addition
    // order over the SAME token sequence makes the doubles exact
    "qf2_linear_score" ->
      """WITH t AS (
           SELECT doc_id,
                  CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                       ELSE string_split_regex(trim(text), '\s+') END AS toks
           FROM documents),
         s AS (
           SELECT doc_id, len(toks) AS n,
                  list_sum(list_transform(toks, w ->
                    CAST((((strpos('0123456789abcdef', substr(md5(w),1,1)) - 1)
                             * 16 +
                           (strpos('0123456789abcdef', substr(md5(w),2,1)) - 1))
                            * 37 + 11) % 101 AS DOUBLE) / 50.5 - 1.0)) AS sc
           FROM t)
         SELECT doc_id,
                CAST(1.0/(1.0 + exp(-(COALESCE(sc, 0.0)/GREATEST(n, 1))))
                  AS REAL) AS quality_prob
         FROM s""",

    "qf1_quality_filter" ->
      """WITH q AS (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE array_length(string_split_regex(trim(text), '\s+'))
             END AS n_words,
             length(text) AS nc,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
               AS np,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> lower(x) IN ('the','a','an','and','or','of','to','in','is',
                                 'was','it','for','on','with','as','at','by')))
               AS nstop,
             list_sum(list_transform(string_split_regex(trim(text), '\s+'),
               x -> length(x))) AS wlen
           FROM documents),
         sig AS (
           SELECT doc_id, n_words,
                  CASE WHEN n_words > 0 THEN CAST(nstop AS DOUBLE)/n_words
                       ELSE 0 END AS stop_r,
                  CASE WHEN nc > 0 THEN CAST(np AS DOUBLE)/nc
                       ELSE 0 END AS punct_r,
                  CASE WHEN n_words > 0 THEN CAST(wlen AS DOUBLE)/n_words
                       ELSE 0 END AS mwl
           FROM q),
         w AS (SELECT doc_id,
                      string_split(trim(regexp_replace(lower(text), '\s+', ' ',
                        'g')), ' ') AS ws
               FROM documents),
         gr AS (SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(ws),1)),
                         i -> ws[i] || ' ' || ws[i+1])) AS gram
                FROM w),
         c AS (SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2),
         t AS (SELECT doc_id, CAST(max(c) AS DOUBLE)/sum(c) AS tf
               FROM c GROUP BY 1),
         fl AS (
           SELECT s.doc_id, s.n_words, s.stop_r, s.punct_r, s.mwl,
                  coalesce(t.tf, 0) AS tf
           FROM sig s LEFT JOIN t ON s.doc_id = t.doc_id),
         r AS (
           SELECT doc_id,
                  (CASE WHEN n_words < 40 THEN 1 ELSE 0 END
                   + CASE WHEN stop_r < 0.04 THEN 2 ELSE 0 END
                   + CASE WHEN punct_r > 0.10 THEN 4 ELSE 0 END
                   + CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 8 ELSE 0 END
                   + CASE WHEN tf > 0.06 THEN 16 ELSE 0 END) AS reasons
           FROM fl)
         SELECT doc_id,
                CAST(CASE WHEN reasons = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep,
                CAST(reasons AS BIGINT) AS reasons
         FROM r""",

    // corpus report: qf1 quality rules + ROLLUP grouping sets
    "rep1_corpus_report" ->
      """WITH q AS (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE array_length(string_split_regex(trim(text), '\s+'))
             END AS n_words,
             length(text) AS nc,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
               AS np,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> lower(x) IN ('the','a','an','and','or','of','to','in','is',
                                 'was','it','for','on','with','as','at','by')))
               AS nstop,
             list_sum(list_transform(string_split_regex(trim(text), '\s+'),
               x -> length(x))) AS wlen
           FROM documents),
         sig AS (
           SELECT doc_id, n_words,
                  CASE WHEN n_words > 0 THEN CAST(nstop AS DOUBLE)/n_words
                       ELSE 0 END AS stop_r,
                  CASE WHEN nc > 0 THEN CAST(np AS DOUBLE)/nc
                       ELSE 0 END AS punct_r,
                  CASE WHEN n_words > 0 THEN CAST(wlen AS DOUBLE)/n_words
                       ELSE 0 END AS mwl
           FROM q),
         w AS (SELECT doc_id,
                      string_split(trim(regexp_replace(lower(text), '\s+', ' ',
                        'g')), ' ') AS ws
               FROM documents),
         gr AS (SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(ws),1)),
                         i -> ws[i] || ' ' || ws[i+1])) AS gram
                FROM w),
         c AS (SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2),
         t AS (SELECT doc_id, CAST(max(c) AS DOUBLE)/sum(c) AS tf
               FROM c GROUP BY 1),
         fl AS (
           SELECT s.doc_id, s.n_words, s.stop_r, s.punct_r, s.mwl,
                  coalesce(t.tf, 0) AS tf
           FROM sig s LEFT JOIN t ON s.doc_id = t.doc_id),
         r AS (
           SELECT doc_id,
                  (CASE WHEN n_words < 40 THEN 1 ELSE 0 END
                   + CASE WHEN stop_r < 0.04 THEN 2 ELSE 0 END
                   + CASE WHEN punct_r > 0.10 THEN 4 ELSE 0 END
                   + CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 8 ELSE 0 END
                   + CASE WHEN tf > 0.06 THEN 16 ELSE 0 END) AS reasons
           FROM fl),
         k AS (
           SELECT d.doc_id, d.source, d.lang,
                  CASE WHEN length(trim(d.text)) = 0 THEN 0
                       ELSE array_length(string_split_regex(trim(d.text),
                         '\s+')) END AS w,
                  CASE WHEN r.reasons = 0 THEN 1 ELSE 0 END AS keep
           FROM documents d JOIN r USING (doc_id))
         SELECT coalesce(source, '<all>') AS source,
                coalesce(lang, '<all>') AS lang,
                count(*) AS n_docs,
                CAST(sum(w) AS BIGINT) AS total_words,
                CAST(sum(keep) AS BIGINT) AS n_kept
         FROM k GROUP BY ROLLUP (source, lang)""",

    // the exact-new count is replayable; the bloom invariants (subset
    // of exact-new, bounded FP count) are pinned as literal TRUEs —
    // Spark computes them from the real filter and a violation fails
    // the hash compare
    "bloom1_incremental_bloom" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_exact_new,
                TRUE AS fp_ok, TRUE AS no_false_negatives
         FROM documents b
         WHERE b.source <> 'src0' AND NOT EXISTS (
           SELECT 1 FROM documents c WHERE c.source = 'src0'
             AND trim(regexp_replace(lower(c.text), '\s+', ' ', 'g')) =
                 trim(regexp_replace(lower(b.text), '\s+', ' ', 'g')))""",

    "url1_url_dedup" ->
      """WITH wu AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 5 = 0 THEN
                    (CASE WHEN doc_id % 10 = 0 THEN 'https://WWW.Example'
                          ELSE 'http://example' END)
                    || CAST(doc_id % 7 AS VARCHAR) || '.com/p/'
                    || CAST(doc_id % 13 AS VARCHAR)
                    || (CASE WHEN doc_id % 10 = 0 THEN '/?utm=x#top'
                             ELSE '/' END)
                  END AS url
           FROM documents),
         n AS (SELECT doc_id,
                      regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(lower(url), '^https?://', ''),
                        '^www\.', ''), '[?#].*$', ''), '/$', '') AS url_norm
               FROM wu WHERE url IS NOT NULL)
         SELECT url_norm, count(*) AS n_docs, min(doc_id) AS canonical_id
         FROM n GROUP BY url_norm""",

    // flagship composition: quality gate (qf1 rules) → exact dedup
    // (min-id canonical) → 3-gram decontamination (dc1 rule) → salted
    // hash split (smp2 rule) → per-split corpus stats
    "pipe1_assemble" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
         q AS (
           SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE array_length(string_split_regex(trim(text), '\s+'))
             END AS n_words,
             length(text) AS nc,
             length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))
               AS np,
             len(list_filter(string_split_regex(trim(text), '\s+'),
               x -> lower(x) IN ('the','a','an','and','or','of','to','in','is',
                                 'was','it','for','on','with','as','at','by')))
               AS nstop,
             list_sum(list_transform(string_split_regex(trim(text), '\s+'),
               x -> length(x))) AS wlen
           FROM corpus),
         sig AS (
           SELECT doc_id, n_words,
                  CASE WHEN n_words > 0 THEN CAST(nstop AS DOUBLE)/n_words
                       ELSE 0 END AS stop_r,
                  CASE WHEN nc > 0 THEN CAST(np AS DOUBLE)/nc
                       ELSE 0 END AS punct_r,
                  CASE WHEN n_words > 0 THEN CAST(wlen AS DOUBLE)/n_words
                       ELSE 0 END AS mwl
           FROM q),
         w AS (SELECT doc_id,
                      string_split(trim(regexp_replace(lower(text), '\s+', ' ',
                        'g')), ' ') AS ws
               FROM corpus),
         gr AS (SELECT doc_id,
                       unnest(list_transform(range(1, greatest(len(ws),1)),
                         i -> ws[i] || ' ' || ws[i+1])) AS gram
                FROM w),
         c AS (SELECT doc_id, gram, count(*) AS c FROM gr GROUP BY 1, 2),
         t AS (SELECT doc_id, CAST(max(c) AS DOUBLE)/sum(c) AS tf
               FROM c GROUP BY 1),
         fl AS (
           SELECT s.doc_id, s.n_words, s.stop_r, s.punct_r, s.mwl,
                  coalesce(t.tf, 0) AS tf
           FROM sig s LEFT JOIN t ON s.doc_id = t.doc_id),
         r AS (
           SELECT doc_id,
                  (CASE WHEN n_words < 40 THEN 1 ELSE 0 END
                   + CASE WHEN stop_r < 0.04 THEN 2 ELSE 0 END
                   + CASE WHEN punct_r > 0.10 THEN 4 ELSE 0 END
                   + CASE WHEN mwl < 3.0 OR mwl > 10.0 THEN 8 ELSE 0 END
                   + CASE WHEN tf > 0.06 THEN 16 ELSE 0 END) AS reasons
           FROM fl),
         kept AS (
           SELECT c2.doc_id, c2.text FROM corpus c2
           JOIN (SELECT doc_id FROM r WHERE reasons = 0) kq USING (doc_id)),
         canon AS (
           SELECT min(doc_id) AS doc_id FROM kept
           GROUP BY trim(regexp_replace(lower(text), '\s+', ' ', 'g'))),
         dd AS (SELECT k.doc_id, k.text FROM kept k JOIN canon USING (doc_id)),
         dw AS (SELECT doc_id,
                       string_split(trim(regexp_replace(lower(text), '\s+',
                         ' ', 'g')), ' ') AS ws2
                FROM dd),
         gg AS (SELECT doc_id,
                       list_distinct(list_transform(
                         range(1, greatest(len(ws2)-2,0)+1),
                         i -> ws2[i] || ' ' || ws2[i+1] || ' ' || ws2[i+2]))
                         AS sh
                FROM dw),
         bw AS (SELECT string_split(trim(regexp_replace(lower(text), '\s+',
                  ' ', 'g')), ' ') AS ws3
                FROM documents WHERE doc_id % 50 = 0),
         bg AS (SELECT list_distinct(flatten(list(list_transform(
                  range(1, greatest(len(ws3)-2,0)+1),
                  i -> ws3[i] || ' ' || ws3[i+1] || ' ' || ws3[i+2])))) AS bsh
                FROM bw),
         clean AS (SELECT g.doc_id FROM gg g, bg
                   WHERE len(list_intersect(g.sh, bg.bsh)) = 0),
         fin AS (
           SELECT d.doc_id,
                  CASE WHEN md5('graft:' || CAST(d.doc_id AS VARCHAR)) < '0d'
                         THEN 'test'
                       WHEN md5('graft:' || CAST(d.doc_id AS VARCHAR)) < '1a'
                         THEN 'val'
                       ELSE 'train' END AS split,
                  CASE WHEN length(trim(d.text)) = 0 THEN 0
                       ELSE array_length(string_split_regex(trim(d.text),
                         '\s+')) END AS n_words
           FROM dd d JOIN clean USING (doc_id))
         SELECT split, count(*) AS n_docs,
                CAST(sum(n_words) AS BIGINT) AS total_words
         FROM fin GROUP BY split""",

    "seg1_segment_dedup" ->
      """WITH words AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         segs AS (
           SELECT doc_id, i AS seg_idx,
                  array_to_string(w[(i-1)*10+1 : i*10], ' ') AS seg
           FROM words,
                UNNEST(generate_series(1,
                  greatest(CAST(ceil(len(w)/10.0) AS BIGINT), 1))) AS t(i)),
         kept AS (
           SELECT doc_id, seg_idx, seg FROM (
             SELECT doc_id, seg_idx, seg,
                    row_number() OVER (PARTITION BY seg
                                       ORDER BY doc_id, seg_idx) AS rn
             FROM segs) WHERE rn = 1)
         SELECT doc_id, count(*) AS n_kept,
                md5(string_agg(seg, ' ' ORDER BY seg_idx)) AS h
         FROM kept GROUP BY doc_id""",

    "inc1_incremental_dedup" ->
      """SELECT b.doc_id, b.source FROM documents b
         WHERE b.source <> 'src0' AND NOT EXISTS (
           SELECT 1 FROM documents c WHERE c.source = 'src0'
             AND trim(regexp_replace(lower(c.text), '\s+', ' ', 'g')) =
                 trim(regexp_replace(lower(b.text), '\s+', ' ', 'g')))""",

    "mix1_mixture_sample" ->
      """SELECT doc_id, source FROM documents
         WHERE md5('mix:' || CAST(doc_id AS VARCHAR)) <
               CASE source WHEN 'src0' THEN 'g'
                           WHEN 'src1' THEN '80'
                           WHEN 'src2' THEN '40' END""",

    "zipf1_term_stats" ->
      """WITH terms AS (
           SELECT unnest(string_split(
             trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS term
           FROM documents),
         counts AS (
           SELECT term, count(*) AS freq FROM terms
           WHERE term <> '' GROUP BY term),
         total AS (SELECT sum(freq) AS t FROM counts),
         top AS (
           SELECT term, freq,
                  row_number() OVER (ORDER BY freq DESC, term) AS rank
           FROM counts ORDER BY freq DESC, term LIMIT 50)
         SELECT rank, term, freq,
                CAST(CAST(freq AS DOUBLE)/t AS REAL) AS share,
                CAST(CAST(sum(freq) OVER (ORDER BY rank) AS DOUBLE)/t AS REAL)
                  AS cum_share
         FROM top, total"""
  )
}
