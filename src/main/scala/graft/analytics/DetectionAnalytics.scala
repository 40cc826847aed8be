package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stateful-detection / CEP analytics.
  *
  * Re-expresses the reference's LoginFailDetect + OrderPayDetect modules
  * (REF: LoginFailDetect/src/main/scala/{LoginFail,LoginFailAdvance,
  * LoginFailWithCep}.scala; OrderPayDetect/src/main/scala/{OrderTimeout,
  * OrderTimeoutWithoutCep,TxMatch,TxMatchByJoin}.scala — reconstructed,
  * see SURVEY.md §0).
  *
  * The reference builds per-key NFAs / keyed state machines with timers;
  * in batch the same semantics are declarative (SURVEY.md §2.8):
  * CEP `next` (strict contiguity) ≡ `lag` over ts-sorted per-key rows,
  * CEP `followedBy … within` ≡ a time-bounded left join, CoProcess
  * reconciliation ≡ a full-outer join whose null sides are the timeout
  * side-outputs. Streaming parity uses stream-stream joins /
  * transformWithState (graft.streaming).
  */
object DetectionAnalytics {

  /** Consecutive login failures within a deadline → warning.
    * REF: LoginFailAdvance.scala § LoginFailWarningAdvanceResult and
    * LoginFailWithCep.scala § Pattern.next("secondFail") — two adjacent
    * fails within 2 s. Proxy: event_type 'error' plays "fail"; deadline
    * widened to 30 min for the synthetic stream's event density.
    * `lag` over (user_id, ts, event_id) is *more* correct than the
    * reference's state version, which mis-pairs out-of-order events
    * (the course discusses exactly this caveat).
    */
  def loginFailDetect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, sfDir)
      .filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id")
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .filter($"prev_ts".isNotNull &&
        unix_micros($"ts") - unix_micros($"prev_ts") <= 30L * 60 * 1000000)
      .select($"user_id", $"prev_ts".as("first_fail"), $"ts".as("last_fail"),
        lit("consecutive login failures").as("msg"))
      .orderBy($"user_id", $"first_fail", $"last_fail")
  }

  /** Order-payment timeout: every "create" (signup) either pays
    * (first purchase by the same user within 24 h) or times out.
    * REF: OrderTimeout.scala § Pattern create→followedBy(pay).within(15m)
    * + PatternTimeoutFunction; OrderTimeoutWithoutCep.scala
    * § OrderPayMatch. The NFA + timeout side-output collapses into a
    * time-bounded left join + CASE — the null right side IS the timeout
    * stream. Deadline widened 15 min → 24 h for the testdata density.
    */
  def orderTimeout(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val creates = ev.filter($"event_type" === "signup")
      .select($"event_id".as("order_id"), $"user_id", $"ts".as("create_ts"))
    // distinct name on the pay side: both legs derive from `ev`, so
    // creates("user_id") === pays("user_id") resolves to the SAME
    // attribute (Spark's "trivially true equals predicate" warning)
    val pays = ev.filter($"event_type" === "purchase")
      .select($"user_id".as("pay_user"), $"ts".as("pay_ts"))
    creates.join(pays,
        $"user_id" === $"pay_user" &&
          $"pay_ts" > $"create_ts" &&
          $"pay_ts" <= $"create_ts" + expr("interval 24 hours"),
        "left_outer")
      .groupBy($"order_id", $"user_id", $"create_ts")
      .agg(min($"pay_ts").as("pay_ts"))
      .withColumn("status",
        when($"pay_ts".isNotNull, lit("payed successfully")).otherwise(lit("timeout")))
      .select($"order_id", $"user_id", $"create_ts", $"pay_ts", $"status")
      .orderBy($"order_id")
  }

  /** Two-stream transaction reconciliation: purchases vs click receipts
    * on a synthesized tx key, with both unmatched sides retained.
    * REF: TxMatch.scala § TxPayMatch (CoProcessFunction, two ValueStates,
    * timers → side outputs unmatched-pays / unmatched-receipts). The
    * whole state machine is one full-outer join; the two side outputs
    * are its null sides — Catalyst reuses a single shuffle for all
    * three logical outputs (SURVEY.md §3.3).
    */
  def txMatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    def txSide(kind: String, cntName: String) = ev
      .filter($"event_type" === kind)
      .select(concat($"user_id", lit("-"),
        get_json_object($"props", "$.k")).as("tx_id"))
      .groupBy($"tx_id").agg(count(lit(1)).as(cntName))
    val pays = txSide("purchase", "pay_cnt")
    val receipts = txSide("click", "receipt_cnt")
    pays.join(receipts, Seq("tx_id"), "full_outer")
      .withColumn("status",
        when($"pay_cnt".isNotNull && $"receipt_cnt".isNotNull, lit("matched"))
          .when($"receipt_cnt".isNull, lit("unmatched-pay"))
          .otherwise(lit("unmatched-receipt")))
      .select($"tx_id",
        coalesce($"pay_cnt", lit(0L)).as("pay_cnt"),
        coalesce($"receipt_cnt", lit(0L)).as("receipt_cnt"),
        $"status")
      .orderBy($"tx_id")
  }

  /** As-of attribution: for every view, the user's most recent prior
    * purchase (classic last-touch attribution). Runs on the custom
    * sort-merge AsOfJoinExec (graft.plans.AsOfJoin — LogicalPlan +
    * Strategy + SparkPlan); DuckDB's native ASOF LEFT JOIN is the
    * independent oracle.
    */
  def asofAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val views = ev.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", $"ts".as("view_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user"),
        $"ts".as("purchase_ts"))
    graft.plans.AsOfJoin.asof(views, purchases,
        "user_id", "p_user", "view_ts", "purchase_ts")
      .select($"view_id", $"user_id", $"view_ts", $"purchase_id", $"purchase_ts")
      .orderBy($"view_id")
  }

  /** The 3-step strict-next funnel pattern shared by the batch query,
    * the streaming NFA parity test, and the oracle: per user,
    * view → click → purchase on IMMEDIATELY consecutive events within
    * 72 h. REF: LoginFailWithCep.scala § Pattern.begin("firstFail")
    * .next("secondFail").within(…) — the reusable generalization the
    * two hard-coded patterns (login-fail, order-timeout) instantiate.
    */
  val funnelPattern: graft.cep.Pattern = graft.cep.Pattern(Seq(
    graft.cep.Step("view", col("event_type") === "view"),
    graft.cep.Step("click", col("event_type") === "click"),
    graft.cep.Step("purchase", col("event_type") === "purchase")),
    withinUs = 72L * 3600 * 1000000)

  /** Generic-CEP funnel: [[funnelPattern]] compiled to the per-key lag
    * form (one window sort per user — no state, no driver loop).
    */
  def cepFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    funnelPattern
      .compileBatch(Tables.events(spark, sfDir), $"user_id", $"ts", $"event_id")
      .withColumnRenamed("key", "user_id")
      .orderBy($"user_id", $"end_event")
  }

  /** Relaxed (`followedBy`) instance: signup → earliest following
    * purchase → earliest following click, within 72 h — the
    * OrderTimeout-style contiguity (REF: OrderTimeout.scala §
    * Pattern.begin("create").followedBy("pay").within(…) —
    * reconstructed). Compiles to a chain of forward as-of joins on the
    * custom AsOfJoinExec; DuckDB's native forward ASOF is the oracle.
    */
  val relaxedFunnelPattern: graft.cep.Pattern = graft.cep.Pattern(Seq(
    graft.cep.Step("signup", col("event_type") === "signup"),
    graft.cep.Step("purchase", col("event_type") === "purchase"),
    graft.cep.Step("click", col("event_type") === "click")),
    withinUs = 72L * 3600 * 1000000, strict = false)

  def cepFunnelRelaxed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    relaxedFunnelPattern
      .compileBatch(Tables.events(spark, sfDir), $"user_id", $"ts", $"event_id")
      .withColumnRenamed("key", "user_id")
      .orderBy($"user_id", $"start_event")
  }

  val cepFunnelRelaxedOracle: String =
    """WITH s0 AS (SELECT user_id, ts AS t0, event_id AS o0 FROM events WHERE event_type = 'signup'),
      |s1 AS (SELECT user_id AS u1, ts AS t1, event_id AS o1 FROM events WHERE event_type = 'purchase'),
      |s2 AS (SELECT user_id AS u2, ts AS t2, event_id AS o2 FROM events WHERE event_type = 'click'),
      |j1 AS (SELECT * FROM s0 ASOF JOIN s1 ON s0.user_id = s1.u1 AND s0.t0 < s1.t1
      |       WHERE epoch_us(t1) - epoch_us(t0) <= 259200000000),
      |j2 AS (SELECT * FROM j1 ASOF JOIN s2 ON j1.user_id = s2.u2 AND j1.t1 < s2.t2
      |       WHERE epoch_us(t2) - epoch_us(t0) <= 259200000000)
      |SELECT user_id, o0 AS start_event, t0 AS start_ts,
      |       o2 AS end_event, t2 AS end_ts
      |FROM j2 ORDER BY user_id, start_event""".stripMargin

  /** Funnel CONVERSION-RATE dashboard: per signup-day cohort, how many
    * signups reach the purchase step (≤ 72 h) and the full
    * signup→purchase→click chain — the product-analytics rollup built
    * compositionally from the SAME generic Pattern API at prefix
    * lengths 2 and 3 (each prefix compiles to its own forward as-of
    * chain; a signup event is "converted at step k" iff the k-step
    * pattern matched it as start_event). Counts are per signup EVENT;
    * the aggregation is one groupBy over O(days) keys, and the rate
    * division is written identically on both engines.
    */
  def funnelRates(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val prefix2 = graft.cep.Pattern(relaxedFunnelPattern.rawSteps.take(2),
      withinUs = relaxedFunnelPattern.withinUs, strict = false)
    val c2 = prefix2.compileBatch(ev, $"user_id", $"ts", $"event_id")
      .select($"start_event").distinct().withColumn("hit2", lit(1))
    val c3 = relaxedFunnelPattern
      .compileBatch(ev, $"user_id", $"ts", $"event_id")
      .select($"start_event").distinct().withColumn("hit3", lit(1))
    ev.where($"event_type" === "signup")
      .select(to_date($"ts").cast("string").as("cohort_day"),
        $"event_id".as("start_event"))
      .join(c2, Seq("start_event"), "left")
      .join(c3, Seq("start_event"), "left")
      .groupBy($"cohort_day")
      .agg(count(lit(1)).as("n_signups"),
        sum(coalesce($"hit2", lit(0))).as("n_purchase"),
        sum(coalesce($"hit3", lit(0))).as("n_full"))
      .selectExpr("cohort_day", "n_signups", "n_purchase", "n_full",
        "cast(n_purchase as double) / n_signups as rate_purchase",
        "cast(n_full as double) / n_signups as rate_full")
      .orderBy($"cohort_day")
  }

  val funnelRatesOracle: String =
    """WITH s0 AS (SELECT user_id, ts AS t0, event_id AS o0 FROM events WHERE event_type = 'signup'),
      |s1 AS (SELECT user_id AS u1, ts AS t1, event_id AS o1 FROM events WHERE event_type = 'purchase'),
      |s2 AS (SELECT user_id AS u2, ts AS t2, event_id AS o2 FROM events WHERE event_type = 'click'),
      |j1 AS (SELECT * FROM s0 ASOF JOIN s1 ON s0.user_id = s1.u1 AND s0.t0 < s1.t1
      |       WHERE epoch_us(t1) - epoch_us(t0) <= 259200000000),
      |j2 AS (SELECT * FROM j1 ASOF JOIN s2 ON j1.user_id = s2.u2 AND j1.t1 < s2.t2
      |       WHERE epoch_us(t2) - epoch_us(t0) <= 259200000000),
      |agg AS (
      |  SELECT CAST(CAST(s0.t0 AS DATE) AS VARCHAR) AS cohort_day,
      |         count(*) AS n_signups,
      |         CAST(sum(CASE WHEN s0.o0 IN (SELECT o0 FROM j1) THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |         CAST(sum(CASE WHEN s0.o0 IN (SELECT o0 FROM j2) THEN 1 ELSE 0 END) AS BIGINT) AS n_full
      |  FROM s0 GROUP BY 1
      |)
      |SELECT cohort_day, n_signups, n_purchase, n_full,
      |       CAST(n_purchase AS DOUBLE) / n_signups AS rate_purchase,
      |       CAST(n_full AS DOUBLE) / n_signups AS rate_full
      |FROM agg ORDER BY cohort_day""".stripMargin

  /** Absence instance (Flink `notFollowedBy`): signups with no purchase
    * in the following 24 h — the order-timeout side output expressed
    * through the generic pattern API (its rows are exactly
    * `order_timeout WHERE status = 'timeout'`; the independent
    * NOT EXISTS oracle keeps the check honest).
    */
  val absencePattern: graft.cep.Pattern = graft.cep.Pattern(Seq(
    graft.cep.Step("signup", col("event_type") === "signup"),
    graft.cep.Step("purchase", col("event_type") === "purchase")),
    withinUs = 24L * 3600 * 1000000, strict = false)

  def cepAbsence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    absencePattern
      .compileBatchAbsence(Tables.events(spark, sfDir), $"user_id", $"ts", $"event_id")
      .withColumnRenamed("key", "user_id")
      .orderBy($"event")
  }

  val cepAbsenceOracle: String =
    """SELECT s.user_id, s.event_id AS event, s.ts
      |FROM events s WHERE s.event_type = 'signup' AND NOT EXISTS (
      |  SELECT 1 FROM events p
      |  WHERE p.event_type = 'purchase' AND p.user_id = s.user_id
      |    AND p.ts > s.ts
      |    AND epoch_us(p.ts) - epoch_us(s.ts) <= 86400000000)
      |ORDER BY event""".stripMargin

  val cepFunnelOracle: String =
    """WITH l AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type, 1) OVER w AS m1,
      |         lag(event_type, 2) OVER w AS m2,
      |         lag(ts, 2) OVER w AS start_ts,
      |         lag(event_id, 2) OVER w AS start_event
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT user_id, start_event, start_ts, event_id AS end_event, ts AS end_ts
      |FROM l
      |WHERE event_type = 'purchase' AND m1 = 'click' AND m2 = 'view'
      |  AND epoch_us(ts) - epoch_us(start_ts) <= 259200000000
      |ORDER BY user_id, end_event""".stripMargin

  /** Kleene instance (Flink `timesOrMore(2).greedy().consecutive()`):
    * maximal runs of ≥2 back-to-back errors per user whose span fits
    * 24 h — the login-fail detector generalized from pairs to whole
    * bursts (one row per burst with its length, not one per pair).
    */
  def cepBursts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.cep.Pattern.consecutiveRuns(
        Tables.events(spark, sfDir), $"user_id", $"ts", $"event_id",
        $"event_type" === "error", minTimes = 2,
        withinUs = 24L * 3600 * 1000000)
      .withColumnRenamed("key", "user_id")
      .orderBy($"user_id", $"start_event")
  }

  /** Gaps-and-islands replay; events carry unique timestamps per key,
    * so arg_min/arg_max on ts match the Spark struct-min tie-break. */
  val cepBurstsOracle: String =
    """WITH base AS (
      |  SELECT user_id AS key, ts, event_id AS ord,
      |         (event_type = 'error') AS m,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) AS rn_all
      |  FROM events
      |), runs AS (
      |  SELECT key, ts, ord,
      |         rn_all - row_number() OVER (PARTITION BY key
      |                                     ORDER BY ts, ord) AS grp
      |  FROM base WHERE m
      |), agg AS (
      |  SELECT key, grp, count(*) AS times,
      |         arg_min(ord, ts) AS start_event, min(ts) AS start_ts,
      |         arg_max(ord, ts) AS end_event, max(ts) AS end_ts
      |  FROM runs GROUP BY 1, 2
      |)
      |SELECT key AS user_id, start_event, start_ts, end_event, end_ts, times
      |FROM agg
      |WHERE times >= 2
      |  AND epoch_us(end_ts) - epoch_us(start_ts) <= 86400000000
      |ORDER BY user_id, start_event""".stripMargin

  /** Interval (range) join: lineitems shipped within 5 days of their
    * order date. REF: TxMatchByJoin.scala § intervalJoin.between(-5s,5s)
    * — equi key + bounded time range. On the relational side this is
    * orders ⋈ lineitem: equi on orderkey (shuffle/broadcast hash join)
    * plus a residual range predicate — no NFA, no per-key state.
    */
  def intervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderdate")
    val l = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate")
    o.join(l, $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" >= $"o_orderdate" &&
        $"l_shipdate" <= $"o_orderdate" + expr("interval 5 days"))
      .select($"o_orderkey", $"l_linenumber", $"o_orderdate", $"l_shipdate")
      .orderBy($"o_orderkey", $"l_linenumber")
  }

  /** KEYLESS range join, bucketized — root-cause correlation: every
    * event within ±60 s of any error event. [[intervalJoin]] has an
    * equi key (orderkey) so its range predicate rides a hash join as a
    * residual; with NO shared key Spark's only built-in plans are
    * BroadcastNestedLoopJoin (fine while one side broadcasts, O(n·m)
    * compares regardless) or a cartesian — the classic scale trap.
    *
    * The bucketized form is the standard fix (interval binning — the
    * same technique behind Databricks' range-join hints): quantize
    * time into buckets of at least the window span (120 s ≥ 2·60 s),
    * explode each ±60 s window onto the ≤ 2 buckets it can overlap
    * (`sequence(lo div b, hi div b)`), assign each probe event to the
    * ONE bucket containing it, equi-join on bucket, then apply the
    * exact containment predicate as a residual. Every matching
    * (window, probe) pair meets in exactly the probe's bucket, so no
    * dedup pass is needed. At 100 TB this is one shuffle on a dense
    * integer key with ≤ 2× fan-out on the (much smaller) window side —
    * vs n·m comparisons for the nested loop. Bucket-count skew =
    * event-time traffic skew, which AQE's skew-join splitting handles;
    * the residual cuts candidate pairs to true matches per bucket.
    */
  def rangeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val BucketUs = 120000000L // 120 s ≥ window span, so ≤ 2 buckets/window
    val HalfUs = 60000000L
    val ev = Tables.events(spark, sfDir)
      .selectExpr("event_id", "event_type", "unix_micros(ts) as ts_us")
    val probes = ev
      .withColumn("bucket", expr(s"ts_us div $BucketUs"))
    val windows = ev.where($"event_type" === "error")
      .selectExpr("event_id as err_id",
        s"ts_us - $HalfUs as lo_us", s"ts_us + $HalfUs as hi_us")
      .withColumn("bucket",
        explode(expr(s"sequence(lo_us div $BucketUs, hi_us div $BucketUs)")))
    windows.join(probes, "bucket")
      .where($"ts_us" >= $"lo_us" && $"ts_us" <= $"hi_us" &&
        $"event_id" =!= $"err_id")
      .select($"err_id", $"event_id", $"event_type",
        ($"ts_us" - ($"lo_us" + HalfUs)).as("offset_us"))
      .orderBy($"err_id", $"event_id")
  }

  val rangeJoinOracle: String =
    """SELECT w.err_id, e.event_id, e.event_type,
      |       epoch_us(e.ts) - w.c_us AS offset_us
      |FROM (SELECT event_id AS err_id, epoch_us(ts) AS c_us
      |      FROM events WHERE event_type = 'error') w
      |JOIN events e
      |  ON epoch_us(e.ts) >= w.c_us - 60000000
      | AND epoch_us(e.ts) <= w.c_us + 60000000
      | AND e.event_id <> w.err_id
      |ORDER BY w.err_id, e.event_id""".stripMargin
}
