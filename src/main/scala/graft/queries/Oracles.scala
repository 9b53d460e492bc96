package graft.queries

/** DuckDB-runnable ANSI SQL equivalents of [[Relational]] (driver t2 gate).
  *
  * Determinism contract (SURVEY §5.2-3): identical round() on every float
  * aggregate, full-tie-break ORDER BY, explicit casts where DuckDB's type
  * widening differs from Spark (sum(BIGINT)→HUGEINT, extract()→BIGINT).
  */
object RelationalOracles {

  val sql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_topk_parts" ->
      """SELECT p_partkey, p_name,
        |  round(sum(l_quantity), 2) AS units,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name
        |ORDER BY units DESC, p_partkey ASC
        |LIMIT 10""".stripMargin,

    "q03_margin_having" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice), 2) AS gross,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS net,
        |  round(sum(l_extendedprice * l_discount)
        |        / nullif(sum(l_extendedprice), 0), 6) AS discount_rate
        |FROM lineitem
        |GROUP BY l_returnflag
        |HAVING round(sum(l_extendedprice), 2) > 1000.0
        |ORDER BY l_returnflag""".stripMargin,

    "q04_channel_kpi" ->
      """SELECT r_name, n_name,
        |  count(*) AS orders,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  round(avg(o_totalprice), 2) AS aov
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q05_full_outer_merge" ->
      """WITH returned AS (
        |  SELECT l_suppkey, l_linestatus,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS r_qty,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS r_rev
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  GROUP BY l_suppkey, l_linestatus),
        |kept AS (
        |  SELECT l_suppkey, l_linestatus,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS k_qty,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS k_rev
        |  FROM lineitem WHERE l_returnflag <> 'R'
        |  GROUP BY l_suppkey, l_linestatus)
        |SELECT l_suppkey, l_linestatus,
        |  CAST(round(coalesce(r_qty, 0), 2) AS DOUBLE) AS returned_qty,
        |  CAST(round(coalesce(k_qty, 0), 2) AS DOUBLE) AS kept_qty,
        |  CAST(round(coalesce(r_rev, 0) + coalesce(k_rev, 0), 2) AS DOUBLE) AS total_rev
        |FROM returned FULL OUTER JOIN kept USING (l_suppkey, l_linestatus)
        |ORDER BY l_suppkey, l_linestatus""".stripMargin,

    "q06_fanout_join" ->
      """SELECT o_orderpriority,
        |  round(sum(o_totalprice), 2) AS inflated_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS line_revenue,
        |  count(*) AS joined_rows
        |FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |HAVING count(*) > 10
        |ORDER BY o_orderpriority""".stripMargin,

    "q07_first_order_repeat" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS odate FROM orders),
        |first AS (
        |  SELECT o_custkey, min(odate) AS first_date FROM o GROUP BY o_custkey)
        |SELECT o.o_custkey,
        |  count(*) AS total_orders,
        |  count(*) FILTER (WHERE odate > first_date) AS repeat_orders,
        |  min(first_date) AS first_date,
        |  round((count(*) FILTER (WHERE odate > first_date))
        |        / CAST(nullif(count(*), 0) AS DOUBLE), 4) AS repeat_rate
        |FROM o JOIN first USING (o_custkey)
        |GROUP BY o.o_custkey
        |ORDER BY o.o_custkey""".stripMargin,

    "q08_retention_scalar" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey)
        |SELECT count(*) AS customers,
        |  count(*) FILTER (WHERE cnt >= 2) AS repeat_customers,
        |  round((count(*) FILTER (WHERE cnt >= 2))
        |        / CAST(nullif(count(*), 0) AS DOUBLE), 4) AS retention_rate
        |FROM per_cust""".stripMargin,

    "q09_acctbal_bands" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |  WHEN c_acctbal BETWEEN 0 AND 3000 THEN 'low'
        |  WHEN c_acctbal BETWEEN 3000 AND 7000 THEN 'mid'
        |  ELSE 'high' END AS band,
        |  count(*) AS customers,
        |  count(DISTINCT c_nationkey) AS nations,
        |  round(avg(c_acctbal), 2) AS avg_bal
        |FROM customer
        |GROUP BY band
        |ORDER BY band""".stripMargin,

    "q10_frequency_bands" ->
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey),
        |banded AS (
        |  SELECT CASE WHEN cnt = 1 THEN 'one'
        |    WHEN cnt BETWEEN 2 AND 4 THEN 'two_to_four'
        |    WHEN cnt BETWEEN 5 AND 9 THEN 'five_to_nine'
        |    ELSE 'ten_plus' END AS freq_band, cnt
        |  FROM per_cust),
        |totals AS (SELECT count(*) AS total_customers FROM per_cust)
        |SELECT freq_band,
        |  count(*) AS customers,
        |  CAST(sum(cnt) AS BIGINT) AS orders,
        |  round(count(*) / CAST(total_customers AS DOUBLE), 4) AS customer_share
        |FROM banded CROSS JOIN totals
        |GROUP BY freq_band, total_customers
        |ORDER BY freq_band""".stripMargin,

    "q11_quadrant" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS revenue,
        |    sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty
        |  FROM lineitem GROUP BY l_partkey),
        |avgs AS (
        |  SELECT avg(CAST(revenue AS DOUBLE)) AS avg_revenue,
        |         avg(CAST(qty AS DOUBLE)) AS avg_qty FROM per_part)
        |SELECT CASE
        |  WHEN revenue >= avg_revenue AND qty >= avg_qty THEN 'hero'
        |  WHEN revenue >= avg_revenue AND qty < avg_qty THEN 'premium'
        |  WHEN revenue < avg_revenue AND qty >= avg_qty THEN 'volume'
        |  ELSE 'dud' END AS quadrant,
        |  count(*) AS parts,
        |  CAST(round(sum(revenue), 2) AS DOUBLE) AS revenue
        |FROM per_part CROSS JOIN avgs
        |GROUP BY quadrant
        |ORDER BY quadrant""".stripMargin,

    "q12_window_rank" ->
      """WITH per_part AS (
        |  SELECT p_brand, p_partkey,
        |    round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand, p_partkey)
        |SELECT p_brand, p_partkey, revenue, rnk FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY p_brand ORDER BY revenue DESC, p_partkey ASC) AS INT) AS rnk
        |  FROM per_part)
        |WHERE rnk <= 3
        |ORDER BY p_brand, rnk""".stripMargin,

    "q13_running_sum" ->
      """SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS odate,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_custkey, odate, o_orderkey""".stripMargin,

    "q14_set_ops" ->
      """WITH building AS (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        |active AS (SELECT DISTINCT o_custkey AS k FROM orders)
        |SELECT
        |  (SELECT count(*) FROM (SELECT k FROM building UNION SELECT k FROM active)) AS union_count,
        |  (SELECT count(*) FROM (SELECT k FROM building INTERSECT SELECT k FROM active)) AS intersect_count,
        |  (SELECT count(*) FROM (SELECT k FROM building EXCEPT SELECT k FROM active)) AS except_count""".stripMargin,

    "q15_semi_anti" ->
      """SELECT
        |  (SELECT count(*) FROM customer WHERE EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS with_orders,
        |  (SELECT count(*) FROM customer WHERE NOT EXISTS
        |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS without_orders""".stripMargin,

    "q16_distinct_count" ->
      """SELECT count(*) AS distinct_triples FROM
        |  (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem)""".stripMargin,

    "q17_events_filter_agg" ->
      """SELECT event_type,
        |  count(*) AS events,
        |  count(*) FILTER (WHERE value > 100) AS big_events,
        |  round(avg(value), 4) AS avg_value,
        |  count(DISTINCT user_id) AS users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q18_date_parts" ->
      """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT CAST(extract(year FROM d) AS INT) AS year,
        |  CAST(extract(month FROM d) AS INT) AS month,
        |  count(*) AS orders,
        |  CAST(min(epoch(CAST(d AS TIMESTAMP))) AS BIGINT) AS min_date_id,
        |  CAST(max(extract(week FROM d)) AS INT) AS max_week
        |FROM d
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q19_regexp_extract" ->
      """SELECT trim(regexp_extract(p_brand, '^[^0-9]+')) AS brand_prefix,
        |  regexp_extract(p_brand, '[0-9]+') AS brand_num,
        |  count(*) AS parts
        |FROM part
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q24_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS rows
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q32_grouping_sets" ->
      """WITH o AS (
        |  SELECT o_orderpriority,
        |    CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
        |    o_totalprice
        |  FROM orders)
        |SELECT o_orderpriority, yr, count(*) AS orders,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |FROM o
        |GROUP BY GROUPING SETS ((o_orderpriority, yr), (o_orderpriority), (yr))
        |ORDER BY o_orderpriority ASC NULLS FIRST, yr ASC NULLS FIRST""".stripMargin,

    "q33_date_spine" ->
      """WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d, o_totalprice FROM orders),
        |b AS (SELECT min(d) AS d0, max(d) AS d1 FROM o),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
        |  FROM b),
        |daily AS (
        |  SELECT d, count(*) AS orders,
        |    CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |  FROM o GROUP BY d)
        |SELECT spine.d, coalesce(daily.orders, 0) AS orders,
        |  coalesce(daily.revenue, 0.0) AS revenue
        |FROM spine LEFT JOIN daily USING (d)
        |ORDER BY d""".stripMargin,

    // q34: SCD2 interval assembly — gaps-and-islands over each user's
    // event stream; valid_to is the next run's exclusive start. The run
    // id is internal numbering only (never emitted) but tie-breaks the
    // interval ordering: it is unique, monotone, and identically derived
    // on both engines, so same-microsecond adjacent runs stay total.
    // Ordering keys (ts_us, event_id) are a total order for the stream.
    "q34_scd2" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        |  FROM events),
        |r AS (
        |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
        |                   OR lag(event_type) OVER w != event_type
        |            THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run
        |  FROM r),
        |i AS (
        |  SELECT user_id, run, min(event_type) AS state,
        |    min(ts_us) AS valid_from_us, count(*) AS n_events
        |  FROM s GROUP BY user_id, run)
        |SELECT user_id, state, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us, run)
        |    AS valid_to_us,
        |  n_events,
        |  CAST(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us, run)
        |    IS NULL AS INT) AS is_current
        |FROM i
        |ORDER BY user_id, valid_from_us""".stripMargin,

    // q41: sweep-line peak concurrency — deltas net per microsecond (tie
    // order irrelevant), day-partitioned running sum + cumulative day
    // carry, peak located by join-back. sum() over BIGINT goes HUGEINT in
    // DuckDB, so every summed column casts back at use.
    "q41_peak_concurrency" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
        |r AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |            THEN 1 ELSE 0 END AS chg
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (
        |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS UNBOUNDED PRECEDING) AS run
        |  FROM r),
        |sess AS (
        |  SELECT user_id, run, min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM s GROUP BY user_id, run),
        |deltas AS (
        |  SELECT ts_us, CAST(sum(d) AS BIGINT) AS nd, ts_us // 86400000000 AS day
        |  FROM (
        |    SELECT start_us AS ts_us, 1 AS d FROM sess
        |    UNION ALL
        |    SELECT end_us + 1 AS ts_us, -1 AS d FROM sess)
        |  GROUP BY ts_us),
        |carry AS (
        |  SELECT day, CAST(coalesce(sum(dsum) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS carry
        |  FROM (SELECT day, sum(nd) AS dsum FROM deltas GROUP BY day)),
        |conc AS (
        |  SELECT d.day, d.ts_us,
        |    c.carry + CAST(sum(d.nd) OVER (PARTITION BY d.day ORDER BY d.ts_us
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
        |  FROM deltas d JOIN carry c USING (day)),
        |peaks AS (SELECT day, max(conc) AS peak_concurrency FROM conc GROUP BY day),
        |peakat AS (
        |  SELECT day, peak_concurrency, min(ts_us) AS peak_at_us
        |  FROM conc JOIN peaks USING (day)
        |  WHERE conc = peak_concurrency
        |  GROUP BY day, peak_concurrency),
        |starts AS (
        |  SELECT start_us // 86400000000 AS day, count(*) AS sessions_started
        |  FROM sess GROUP BY 1)
        |SELECT day,
        |  CAST(coalesce(sessions_started, 0) AS BIGINT) AS sessions_started,
        |  peak_concurrency, peak_at_us
        |FROM peakat FULL OUTER JOIN starts USING (day)
        |ORDER BY day""".stripMargin,

    // q35: join-key skew report — per-key counts, share of table, and
    // hot/mean ratio for the 20 hottest keys (total order: rows desc,
    // key asc). All ratios are single double ops on exact integers.
    "q35_skew_report" ->
      """WITH c AS (
        |  SELECT l_orderkey AS key, count(*) AS rows FROM lineitem GROUP BY 1),
        |t AS (SELECT CAST(sum(rows) AS BIGINT) AS total_rows,
        |             count(*) AS n_keys FROM c)
        |SELECT key, CAST(rows AS BIGINT) AS rows,
        |  round(CAST(rows AS DOUBLE) / total_rows, 6) AS share,
        |  round(CAST(rows AS DOUBLE) * n_keys / total_rows, 4) AS hot_to_mean
        |FROM c CROSS JOIN t
        |ORDER BY rows DESC, key ASC
        |LIMIT 20""".stripMargin,

    // q36: ANALYZE-style column stats — keys and prices are exactly
    // double-representable, NDV is exact countDistinct, one scan.
    "q36_column_stats" ->
      """WITH s AS (
        |  SELECT
        |    CAST(min(o_orderkey) AS DOUBLE) AS min_ok,
        |    CAST(max(o_orderkey) AS DOUBLE) AS max_ok,
        |    count(DISTINCT o_orderkey) AS ndv_ok,
        |    CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS null_ok,
        |    CAST(min(o_custkey) AS DOUBLE) AS min_ck,
        |    CAST(max(o_custkey) AS DOUBLE) AS max_ck,
        |    count(DISTINCT o_custkey) AS ndv_ck,
        |    CAST(count(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT) AS null_ck,
        |    min(o_totalprice) AS min_tp,
        |    max(o_totalprice) AS max_tp,
        |    count(DISTINCT o_totalprice) AS ndv_tp,
        |    CAST(count(*) FILTER (WHERE o_totalprice IS NULL) AS BIGINT) AS null_tp
        |  FROM orders)
        |SELECT 'o_orderkey' AS column_name, min_ok AS min_value,
        |  max_ok AS max_value, ndv_ok AS ndv, null_ok AS null_count FROM s
        |UNION ALL
        |SELECT 'o_custkey', min_ck, max_ck, ndv_ck, null_ck FROM s
        |UNION ALL
        |SELECT 'o_totalprice', min_tp, max_tp, ndv_tp, null_tp FROM s
        |ORDER BY column_name""".stripMargin,

    // q37: data-quality expectations — orphan/PK/null/range violation
    // counts, each an exact integer.
    "q37_dq_report" ->
      """SELECT 'lineitem_orphan_orderkeys' AS check, count(*) AS violations
        |FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        |UNION ALL
        |SELECT 'orders_orphan_custkeys', count(*)
        |FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        |UNION ALL
        |SELECT 'orders_duplicate_pk', count(*) FROM (
        |  SELECT o_orderkey FROM orders GROUP BY 1 HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'orders_null_priority', count(*)
        |FROM orders WHERE o_orderpriority IS NULL
        |UNION ALL
        |SELECT 'lineitem_nonpositive_price', count(*)
        |FROM lineitem WHERE l_extendedprice <= 0
        |ORDER BY "check"""".stripMargin,

    // q38: cohort × age retention matrix — month keys stay integer
    // (year×12+month) so ages subtract exactly; retention is an exact
    // integer ratio rounded at projection.
    "q38_cohort_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT o_custkey,
        |    CAST(extract(year FROM o_orderdate) * 12 +
        |         extract(month FROM o_orderdate) AS INT) AS am
        |  FROM orders),
        |cohort AS (SELECT o_custkey, min(am) AS cm FROM active GROUP BY 1),
        |sizes AS (SELECT cm, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM cohort GROUP BY 1),
        |cells AS (
        |  SELECT c.cm, CAST(a.am - c.cm AS INT) AS age_months,
        |    CAST(count(*) AS BIGINT) AS active_customers
        |  FROM active a JOIN cohort c ON a.o_custkey = c.o_custkey
        |  GROUP BY 1, 2)
        |SELECT CAST((x.cm - 1) // 12 AS VARCHAR) || '-' ||
        |    lpad(CAST((x.cm - 1) % 12 + 1 AS VARCHAR), 2, '0') AS cohort_month,
        |  x.age_months, x.active_customers, s.cohort_size,
        |  round(CAST(x.active_customers AS DOUBLE) / s.cohort_size, 6) AS retention
        |FROM cells x JOIN sizes s ON x.cm = s.cm
        |ORDER BY cohort_month, age_months""".stripMargin,

    // q39: order-sensitive funnel — each step's first event gated
    // at-or-after the user's previous step.
    "q39_funnel" ->
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |n AS (
        |  SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS users FROM s1
        |  UNION ALL
        |  SELECT '2_click', CAST(count(*) AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM s3)
        |SELECT step, users,
        |  round(CAST(users AS DOUBLE) /
        |    (SELECT users FROM n WHERE step = '1_view'), 6) AS pct_of_first
        |FROM n ORDER BY step""".stripMargin,

    // q55: deadline-bounded funnel — q39's gates with a 7-day step
    // expiry; latencies are exact µs integer gaps, one divide per step
    "q55_deadline_funnel" ->
      """WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2, min(s1.t1) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |    AND epoch_us(e.ts) >= s1.t1
        |    AND epoch_us(e.ts) <= s1.t1 + 604800000000
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3, min(s2.t2) AS t2
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |    AND epoch_us(e.ts) >= s2.t2
        |    AND epoch_us(e.ts) <= s2.t2 + 604800000000
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |n AS (
        |  SELECT '1_view' AS step, CAST(count(*) AS BIGINT) AS users,
        |    CAST(NULL AS DOUBLE) AS avg_gap_hours FROM s1
        |  UNION ALL
        |  SELECT '2_click', CAST(count(*) AS BIGINT),
        |    round((CAST(sum(t2 - t1) AS DOUBLE) / count(*)) / 3600000000.0, 4)
        |  FROM s2
        |  UNION ALL
        |  SELECT '3_purchase', CAST(count(*) AS BIGINT),
        |    round((CAST(sum(t3 - t2) AS DOUBLE) / count(*)) / 3600000000.0, 4)
        |  FROM s3)
        |SELECT step, users,
        |  round(CAST(users AS DOUBLE) /
        |    (SELECT users FROM n WHERE step = '1_view'), 6) AS pct_of_first,
        |  avg_gap_hours
        |FROM n ORDER BY step""".stripMargin,

    // q40: pairwise co-purchase support — per-order distinct parts
    // self-joined under part1 < part2.
    "q40_copurchase" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
        |SELECT a.pk AS part1, b.pk AS part2, CAST(count(*) AS BIGINT) AS support
        |FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
        |GROUP BY 1, 2
        |ORDER BY support DESC, part1, part2
        |LIMIT 25""".stripMargin,

    // q30: the oracle is the declarative window form of grouped top-k;
    // the Spark side runs the custom TopKPerGroup operator — equal
    // row sets because the order is total (unique o_orderkey tie-break).
    // q31: per-type extreme values — target = ceil(n/1000) in integer
    // arithmetic; the operator only compares raw doubles, never computes
    // with them, so parity is by construction.
    "q31_extreme_values" ->
      """WITH t AS (
        |  SELECT event_type, count(*) AS n_events,
        |    CAST((count(*) + 999) // 1000 AS INT) AS target
        |  FROM events GROUP BY event_type),
        |r AS (
        |  SELECT event_type, event_id, value, row_number() OVER (
        |    PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
        |  FROM events)
        |SELECT r.event_type, r.event_id, r.value
        |FROM r JOIN t USING (event_type)
        |WHERE rk <= target
        |ORDER BY event_type ASC, value DESC, event_id ASC""".stripMargin,

    "q30_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 5
        |ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "q29_range_frame" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  count(*) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS peers,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,6))) OVER (
        |    PARTITION BY c_mktsegment ORDER BY c_acctbal
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS peer_bal
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,

    "q28_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount)
        |                      AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        |  count(*) AS rows
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag ASC, g_status ASC,
        |  l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q25_pivot" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * (1.0 - l_discount))
        |        FILTER (WHERE l_linestatus = 'F'), 2) AS rev_f,
        |  round(sum(l_extendedprice * (1.0 - l_discount))
        |        FILTER (WHERE l_linestatus = 'O'), 2) AS rev_o
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // q52: unpivot — the oracle computes the LONG form directly (never
    // pivots), so the melt must invert q25 exactly.
    "q52_unpivot" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |WHERE l_linestatus IN ('F', 'O')
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q26_median" ->
      """SELECT l_returnflag,
        |  round(median(l_extendedprice), 4) AS median_price,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    // q53: inter-order gaps are exact BIGINT day counts on a total
    // (date, orderkey) order — sums/counts exact, median interpolates
    // exact integers as doubles (both engines exact at .5)
    "q53_purchase_latency" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS d
        |  FROM orders),
        |g AS (
        |  SELECT o_custkey,
        |    datediff('day',
        |      lag(d) OVER (PARTITION BY o_custkey ORDER BY d ASC, o_orderkey ASC),
        |      d) AS gap
        |  FROM o),
        |j AS (
        |  SELECT c.c_mktsegment AS segment, gap
        |  FROM g JOIN customer c ON g.o_custkey = c.c_custkey
        |  WHERE gap IS NOT NULL)
        |SELECT segment,
        |  count(*) AS n_gaps,
        |  CAST(sum(gap) AS BIGINT) AS total_gap_days,
        |  round(CAST(sum(gap) AS DOUBLE) / count(*), 4) AS avg_gap_days,
        |  median(CAST(gap AS DOUBLE)) AS median_gap_days,
        |  CAST(max(gap) AS BIGINT) AS max_gap_days
        |FROM j
        |GROUP BY segment
        |ORDER BY segment""".stripMargin,

    // q54: Pareto revenue concentration — ntile over the customer spend
    // aggregate with a total (spend desc, custkey) order; shares divide
    // exact decimal sums as doubles
    "q54_revenue_concentration" ->
      """WITH spend AS (
        |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
        |  FROM orders GROUP BY 1),
        |t AS (SELECT sum(spend) AS total_rev FROM spend),
        |d AS (
        |  SELECT o_custkey, spend,
        |    ntile(10) OVER (ORDER BY spend DESC, o_custkey ASC) AS decile
        |  FROM spend)
        |SELECT CAST(decile AS INT) AS decile,
        |  count(*) AS customers,
        |  CAST(round(sum(spend), 2) AS DOUBLE) AS decile_revenue,
        |  round(CAST(sum(spend) AS DOUBLE) / CAST(total_rev AS DOUBLE), 6)
        |    AS revenue_share
        |FROM d CROSS JOIN t
        |GROUP BY decile, total_rev
        |ORDER BY decile""".stripMargin,

    "q27_salted_join" ->
      """SELECT n.n_name,
        |  count(*) AS customers,
        |  CAST(round(sum(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS acctbal_sum
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name
        |ORDER BY n.n_name""".stripMargin,

    "q23_two_phase_distinct" ->
      """SELECT user_id, count(DISTINCT event_type) AS distinct_types
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q22_json_extract" ->
      """WITH e AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k_val
        |  FROM events)
        |SELECT event_type, k_val % 10 AS k_bucket,
        |  count(*) AS events,
        |  round(avg(k_val), 4) AS avg_k
        |FROM e
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q21_weighted_mean" ->
      """SELECT l_returnflag,
        |  round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q20_pnl_summary" ->
      """SELECT
        |  round(sum(l_extendedprice), 2) AS gross_revenue,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS net_revenue,
        |  round(sum(l_extendedprice * l_discount), 2) AS total_discount,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * l_tax), 2) AS total_tax,
        |  count(*) AS line_count
        |FROM lineitem""".stripMargin,

    // q42: multi-touch attribution — the oracle pairs conversions to
    // lookback touches with the plain theta join (correctness form of the
    // engine's bucketed range join); per-row 6dp credits sum as DECIMAL.
    "q42_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |  FROM events),
        |conv AS (
        |  SELECT event_id AS conv_id, user_id, ts_us AS c_us, value
        |  FROM ev WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, ts_us AS t_us, event_type AS channel,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS idx
        |  FROM ev WHERE event_type IN ('view', 'click', 'signup')),
        |j AS (
        |  SELECT conv_id, value, channel, t_us * 4 + idx AS pack
        |  FROM conv JOIN touch USING (user_id)
        |  WHERE t_us < c_us AND t_us >= c_us - 604800000000),
        |chan AS (
        |  SELECT conv_id, value, channel, count(*) AS cnt FROM j GROUP BY 1, 2, 3),
        |tot AS (
        |  SELECT conv_id, value, count(*) AS n,
        |    max(pack) AS lp, min(pack) AS fp
        |  FROM j GROUP BY 1, 2),
        |credits AS (
        |  SELECT 'last_touch' AS model,
        |    CASE lp % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click' ELSE 'signup' END AS channel,
        |    CAST(1 AS DECIMAL(18,6)) AS cc, CAST(value AS DECIMAL(18,6)) AS cv
        |  FROM tot
        |  UNION ALL
        |  SELECT 'first_touch',
        |    CASE fp % 4 WHEN 0 THEN 'view' WHEN 1 THEN 'click' ELSE 'signup' END,
        |    CAST(1 AS DECIMAL(18,6)), CAST(value AS DECIMAL(18,6))
        |  FROM tot
        |  UNION ALL
        |  SELECT 'linear', channel,
        |    CAST(round(cnt / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)),
        |    CAST(round(value * cnt / n, 6) AS DECIMAL(18,6))
        |  FROM chan JOIN (SELECT conv_id, n FROM tot) t USING (conv_id)
        |  UNION ALL
        |  SELECT m.model, '(direct)', CAST(1 AS DECIMAL(18,6)),
        |    CAST(value AS DECIMAL(18,6))
        |  FROM conv c CROSS JOIN (VALUES ('last_touch'), ('first_touch'), ('linear')) m(model)
        |  WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.conv_id = c.conv_id))
        |SELECT model, channel,
        |  CAST(round(sum(cc), 4) AS DOUBLE) AS credited_conversions,
        |  CAST(round(sum(cv), 2) AS DOUBLE) AS credited_value
        |FROM credits GROUP BY model, channel
        |ORDER BY model, channel""".stripMargin,

    // q43: association rules — every score is one double divide over
    // exact BIGINT counts; ranking on the rounded scores + id tie-breaks.
    // The per-basket top-40-by-support cap mirrors
    // Relational.MaxBasketItems (inert on TPC-H's ≤7-item baskets; it
    // bounds the pair join at real scale) — supports stay uncapped.
    "q43_assoc_rules" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |n AS (SELECT count(DISTINCT ok) AS n_orders FROM items),
        |deg AS (SELECT pk, count(*) AS sup FROM items GROUP BY 1),
        |capped AS (
        |  SELECT ok, pk FROM (
        |    SELECT i.ok, i.pk, row_number() OVER (
        |      PARTITION BY i.ok ORDER BY d.sup DESC, i.pk ASC) AS rk
        |    FROM items i JOIN deg d ON i.pk = d.pk)
        |  WHERE rk <= 40),
        |pairs AS (
        |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS sup_ab
        |  FROM capped a JOIN capped b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |rules AS (
        |  SELECT p1 AS ante, p2 AS cons, sup_ab FROM pairs
        |  UNION ALL
        |  SELECT p2, p1, sup_ab FROM pairs),
        |score AS (
        |  SELECT ante, cons, sup_ab AS support,
        |    round(sup_ab / CAST(da.sup AS DOUBLE), 6) AS confidence,
        |    round(sup_ab * n_orders / (CAST(da.sup AS DOUBLE) * db.sup), 6) AS lift,
        |    round(sup_ab / CAST(da.sup + db.sup - sup_ab AS DOUBLE), 6) AS jaccard
        |  FROM rules
        |  JOIN deg da ON ante = da.pk
        |  JOIN deg db ON cons = db.pk
        |  CROSS JOIN n),
        |ranked AS (
        |  SELECT *, row_number() OVER (
        |    ORDER BY lift DESC, confidence DESC, ante ASC, cons ASC) AS rank
        |  FROM score)
        |SELECT ante, cons, support, confidence, lift, jaccard, CAST(rank AS INT) AS rank
        |FROM ranked WHERE rank <= 25 ORDER BY rank""".stripMargin,

    // q44: rolling z-score anomalies — BIGINT window sums over integer
    // daily counts, then one fixed double chain (sqrt is IEEE-exact);
    // DuckDB's window sum(BIGINT) → HUGEINT casts back at the CTE edge.
    "q44_anomaly_zscore" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS events
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, events,
        |    count(events) OVER win AS n7,
        |    CAST(sum(events) OVER win AS BIGINT) AS s7,
        |    CAST(sum(events * events) OVER win AS BIGINT) AS q7
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |m AS (
        |  SELECT event_type, day, events,
        |    s7 / 7.0 AS mean,
        |    sqrt((q7 - s7 * s7 / 7.0) / 6.0) AS sd
        |  FROM w WHERE n7 = 7),
        |z AS (
        |  SELECT event_type, day, events,
        |    round(mean, 4) AS mean7, round(sd, 4) AS sd7,
        |    CASE WHEN sd = 0 THEN CAST(NULL AS DOUBLE)
        |         ELSE round((events - mean) / sd, 4) END AS zscore
        |  FROM m)
        |SELECT event_type, day, events, mean7, sd7, zscore,
        |  CAST(zscore IS NOT NULL AND abs(zscore) >= 2.0 AS INT) AS is_anomaly
        |FROM z ORDER BY event_type, day""".stripMargin,

    // q45: closed-form OLS per group — exact BIGINT moments (x re-based
    // to the global min day), single divides, R² squared via double.
    "q45_trend_fit" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |based AS (
        |  SELECT event_type, day - (SELECT min(day) FROM daily) AS x, y FROM daily),
        |s AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM based GROUP BY 1)
        |SELECT event_type, n AS n_days,
        |  round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        |  round((sy * sxx - sx * sxy) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept,
        |  round((CAST(n * sxy - sx * sy AS DOUBLE) * (n * sxy - sx * sy)) /
        |        (CAST(n * sxx - sx * sx AS DOUBLE) * (n * syy - sy * sy)), 6) AS r2
        |FROM s WHERE n * sxx - sx * sx > 0
        |ORDER BY event_type""".stripMargin,

    // q46: conversion path analysis — the ordered aggregate is DuckDB's
    // string_agg(... ORDER BY pack) vs Spark's array_sort(collect_list)
    // on the same total pack key; counts/shares are one double divide.
    "q46_conversion_paths" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value
        |  FROM events),
        |conv AS (
        |  SELECT event_id AS conv_id, user_id, ts_us AS c_us, value
        |  FROM ev WHERE event_type = 'purchase'),
        |touch AS (
        |  SELECT user_id, ts_us AS t_us, event_type AS channel,
        |    CASE event_type WHEN 'view' THEN 0 WHEN 'click' THEN 1 ELSE 2 END AS idx
        |  FROM ev WHERE event_type IN ('view', 'click', 'signup')),
        |j AS (
        |  SELECT conv_id, value, channel, t_us * 4 + idx AS pack
        |  FROM conv JOIN touch USING (user_id)
        |  WHERE t_us < c_us AND t_us >= c_us - 604800000000),
        |paths AS (
        |  SELECT conv_id, value, string_agg(channel, '>' ORDER BY pack) AS path
        |  FROM j GROUP BY 1, 2),
        |allp AS (
        |  SELECT conv_id, value, path FROM paths
        |  UNION ALL
        |  SELECT conv_id, value, '(direct)'
        |  FROM conv c WHERE NOT EXISTS (SELECT 1 FROM j WHERE j.conv_id = c.conv_id)),
        |tot AS (SELECT count(*) AS total FROM allp),
        |agg AS (
        |  SELECT path, count(*) AS conversions,
        |    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
        |  FROM allp GROUP BY 1),
        |ranked AS (
        |  SELECT path, conversions,
        |    round(conversions / CAST(total AS DOUBLE), 6) AS share, revenue,
        |    row_number() OVER (ORDER BY conversions DESC, path ASC) AS rank
        |  FROM agg CROSS JOIN tot)
        |SELECT CAST(rank AS INT) AS rank, path, conversions, share, revenue
        |FROM ranked WHERE rank <= 25 ORDER BY rank""".stripMargin,

    // q47: EWMA forecast — dyadic weights keep the numerator an exact
    // BIGINT (no pow()); the forecast is one double divide by 255.
    "q47_ewma_forecast" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS events
        |  FROM events GROUP BY 1, 2),
        |lagged AS (
        |  SELECT event_type, day, events,
        |    lag(events, 1) OVER win * 128 + lag(events, 2) OVER win * 64 +
        |    lag(events, 3) OVER win * 32  + lag(events, 4) OVER win * 16 +
        |    lag(events, 5) OVER win * 8   + lag(events, 6) OVER win * 4 +
        |    lag(events, 7) OVER win * 2   + lag(events, 8) OVER win * 1 AS num
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, day, events,
        |  round(num / 255.0, 6) AS forecast,
        |  round(events - num / 255.0, 6) AS residual
        |FROM lagged WHERE num IS NOT NULL
        |ORDER BY event_type, day""".stripMargin,

    // q48: session depth → conversion — gaps-and-islands sessions rolled
    // to the depth grain; single divides of exact BIGINT sums.
    "q48_session_depth" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ts_us, event_type,
        |    CASE WHEN lag(ts_us, 1) OVER win IS NULL
        |           OR ts_us - lag(ts_us, 1) OVER win > 1800000000
        |         THEN 1 ELSE 0 END AS boundary
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
        |s AS (
        |  SELECT user_id, ts_us, event_type,
        |    CAST(sum(boundary) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_seq
        |  FROM b),
        |sess AS (
        |  SELECT user_id, session_seq,
        |    min(ts_us) AS start_us, max(ts_us) AS end_us,
        |    count(*) AS n_events,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        |  FROM s GROUP BY user_id, session_seq)
        |SELECT CAST(least(n_events, 10) AS INT) AS depth,
        |  count(*) AS sessions,
        |  CAST(sum(converted) AS BIGINT) AS converting,
        |  round(CAST(sum(converted) AS DOUBLE) / count(*), 6) AS conversion_rate,
        |  round(CAST(sum(end_us - start_us) AS DOUBLE) / count(*), 4)
        |    AS avg_duration_us
        |FROM sess GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // q50: first-order Markov transition grid — lead over the total
    // (ts, event_id) order; probabilities are single divides of exact
    // BIGINT counts.
    "q50_event_transitions" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type AS from_type,
        |    lead(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts_us ASC, event_id ASC) AS to_type
        |  FROM ev),
        |grid AS (
        |  SELECT from_type, to_type, count(*) AS transitions
        |  FROM tr WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |ft AS (
        |  SELECT from_type, CAST(sum(transitions) AS BIGINT) AS from_total
        |  FROM grid GROUP BY 1),
        |al AS (SELECT CAST(sum(transitions) AS BIGINT) AS all_total FROM grid)
        |SELECT from_type, to_type, transitions,
        |  round(transitions / CAST(from_total AS DOUBLE), 6) AS p_next,
        |  round(transitions / CAST(all_total AS DOUBLE), 6) AS share
        |FROM grid JOIN ft USING (from_type) CROSS JOIN al
        |ORDER BY from_type, to_type""".stripMargin,

    // q51: two-proportion z-test — four exact BIGINT counts, one fixed
    // IEEE double chain (sqrt correctly-rounded), round at projection.
    "q51_ab_test" ->
      """WITH u AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value >= 200
        |        THEN 1 ELSE 0 END) AS converted,
        |    (strpos('0123456789abcdef',
        |       substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 2 AS variant
        |  FROM events GROUP BY user_id),
        |w AS (
        |  SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN variant = 0 THEN converted END) AS BIGINT) AS conv_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN variant = 1 THEN converted END) AS BIGINT) AS conv_b
        |  FROM u)
        |SELECT n_a, conv_a, n_b, conv_b,
        |  round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
        |  round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
        |  round(conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE), 6)
        |    AS abs_lift,
        |  round((conv_b / CAST(n_b AS DOUBLE) - conv_a / CAST(n_a AS DOUBLE)) /
        |    sqrt(((conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
        |         (1.0 - (conv_a + conv_b) / CAST(n_a + n_b AS DOUBLE)) *
        |         (1.0 / n_a + 1.0 / n_b)), 6) AS z_score
        |FROM w""".stripMargin,

    // q49: RFM segmentation — ntile quartiles with custkey tie-breaks
    // (total order → identical boundaries); monetary ranks on the exact
    // decimal spend.
    "q49_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS n_orders,
        |    sum(CAST(o_totalprice AS DECIMAL(18,6))) AS spend
        |  FROM orders GROUP BY 1),
        |sc AS (
        |  SELECT o_custkey, spend,
        |    CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS INT)
        |      AS r_score,
        |    CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) AS INT)
        |      AS f_score,
        |    CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey ASC) AS INT)
        |      AS m_score
        |  FROM cust)
        |SELECT r_score, f_score, m_score, count(*) AS customers,
        |  CAST(round(sum(spend), 2) AS DOUBLE) AS segment_spend
        |FROM sc GROUP BY 1, 2, 3
        |ORDER BY 1, 2, 3""".stripMargin,
  )
}
