package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure `(SparkSession, sfDir) => DataFrame`
  * implemented in `graft.analytics.*`; [[oracleSql]] carries the DuckDB
  * SQL the driver replays over the same parquet tables for the
  * hash-compare correctness gate. Column names and row order match
  * between the two by construction (full-column ORDER BY on both sides).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    UserBehaviorAnalytics.hotItemsTopN(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hot_items_topn"  -> ((s, d) => UserBehaviorAnalytics.hotItemsTopN(s, d)),
    "hot_pages_topn"  -> ((s, d) => UserBehaviorAnalytics.hotPagesTopN(s, d)),
    "page_views"      -> ((s, d) => UserBehaviorAnalytics.pageViews(s, d)),
    "unique_visitors" -> ((s, d) => UserBehaviorAnalytics.uniqueVisitors(s, d)),
    "uv_approx"       -> ((s, d) => UserBehaviorAnalytics.uvApprox(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    *
    * Sliding windows: DuckDB has no HOP window, so the grid is expanded
    * explicitly — every event belongs to size/slide consecutive windows
    * whose starts are epoch-aligned multiples of the slide
    * (`time_bucket` minus k*slide), matching Spark's `window()`
    * alignment (SURVEY.md §7.4).
    */
  def oracleSql: Map[String, String] = Map(
    "hot_items_topn" ->
      """WITH views AS (
        |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS item_id, ts
        |  FROM events WHERE event_type = 'view'
        |), expanded AS (
        |  SELECT item_id,
        |         time_bucket(INTERVAL 5 MINUTE, ts) - k * (INTERVAL 5 MINUTE) AS ws, ts
        |  FROM views CROSS JOIN range(12) g(k)
        |  WHERE time_bucket(INTERVAL 5 MINUTE, ts) - k * (INTERVAL 5 MINUTE)
        |        + INTERVAL 60 MINUTE > ts
        |), counts AS (
        |  SELECT ws + INTERVAL 60 MINUTE AS window_end, item_id, count(*) AS cnt
        |  FROM expanded GROUP BY 1, 2
        |), ranked AS (
        |  SELECT window_end, item_id, cnt,
        |         row_number() OVER (PARTITION BY window_end
        |                            ORDER BY cnt DESC, item_id ASC) AS rnk
        |  FROM counts
        |)
        |SELECT window_end, item_id, cnt, CAST(rnk AS INT) AS rnk
        |FROM ranked WHERE rnk <= 5 ORDER BY window_end, rnk""".stripMargin,
    "hot_pages_topn" ->
      """WITH clicks AS (
        |  SELECT '/page/' || json_extract_string(props, '$.k') AS url, ts
        |  FROM events WHERE event_type = 'click'
        |), expanded AS (
        |  SELECT url,
        |         time_bucket(INTERVAL 1 MINUTE, ts) - k * (INTERVAL 1 MINUTE) AS ws, ts
        |  FROM clicks CROSS JOIN range(10) g(k)
        |  WHERE time_bucket(INTERVAL 1 MINUTE, ts) - k * (INTERVAL 1 MINUTE)
        |        + INTERVAL 10 MINUTE > ts
        |), counts AS (
        |  SELECT ws + INTERVAL 10 MINUTE AS window_end, url, count(*) AS cnt
        |  FROM expanded GROUP BY 1, 2
        |), ranked AS (
        |  SELECT window_end, url, cnt,
        |         row_number() OVER (PARTITION BY window_end
        |                            ORDER BY cnt DESC, url ASC) AS rnk
        |  FROM counts
        |)
        |SELECT window_end, url, cnt, CAST(rnk AS INT) AS rnk
        |FROM ranked WHERE rnk <= 3 ORDER BY window_end, rnk""".stripMargin,
    "page_views" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
        |       count(*) AS pv
        |FROM events WHERE event_type = 'view'
        |GROUP BY 1 ORDER BY window_end""".stripMargin,
    "unique_visitors" ->
      """SELECT time_bucket(INTERVAL 1 HOUR, ts) + INTERVAL 1 HOUR AS window_end,
        |       count(DISTINCT user_id) AS uv
        |FROM events WHERE event_type = 'view'
        |GROUP BY 1 ORDER BY window_end""".stripMargin,
    // uv_approx: intentionally un-oracled (approximate HLL++ sketch);
    // driver records a rows-only check, exactness asserted in ScalaTest.
  )
}
