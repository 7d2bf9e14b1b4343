package graft.operators

import graft.{QDef, QFamily}
import graft.util.D._
import graft.util.Sq
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Event-stream analytics (SURVEY.md §2.7), batch side. The same
  * sessionization semantics run under Structured Streaming via
  * [[graft.streaming.Sessionizer]] (ScalaTest-covered — streaming results
  * cannot be oracled through DuckDB).
  *
  * Scale: window/sessionize shuffle once on user_id; tumbling windows are
  * a plain groupBy on the truncated timestamp (map-side combined). */
object Events extends QFamily {

  /** events.ts has shipped as both TIMESTAMP(NANOS) (long nanos under
    * spark.sql.legacy.parquet.nanosAsLong) and TIMESTAMP(MICROS)
    * (TIMESTAMP_NTZ); [[graft.util.D.normTs]] normalizes either to a UTC
    * TimestampType. The oracle mirrors with CAST(ts AS TIMESTAMP). */
  private def ev(s: org.apache.spark.sql.SparkSession, dir: String) =
    normTs(t(s, dir, "events"))

  private val evSql =
    "ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  val defs: Seq[QDef] = Seq(

    QDef("q_events_window",
      Some(s"""WITH $evSql
              |SELECT date_trunc('hour', ts) AS window_start, event_type,
              |  COUNT(*) AS n, ${Sq.dsum("value")} AS total_value,
              |  ROUND(${Sq.dsum("value")} / COUNT(*), 6) AS avg_value
              |FROM ev GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin),
      (s, dir) => ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsumd(col("value")).as("total_value"),
          graft.util.D.r(dsumd(col("value")) / count(lit(1)), 6).as("avg_value"))
        .orderBy("window_start", "event_type")),

    QDef("q_events_sessionize",
      Some(s"""WITH $evSql,
             |o AS (SELECT user_id, event_id, ts, value,
             |    epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us
             |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |flagged AS (SELECT *,
             |    CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS new_s
             |  FROM o),
             |sess AS (SELECT *,
             |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM flagged)
             |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             |  COUNT(*) AS n_events, MIN(ts) AS session_start, MAX(ts) AS session_end,
             |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us,
             |  CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 6) AS DOUBLE) AS total_value
             |FROM sess GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"), col("value"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
          .withColumn("new_s",
            when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1).otherwise(0))
          .withColumn("session_id", sum(col("new_s")).over(wr).cast(LongType))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
            (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"),
            dsumd(col("value")).as("total_value"))
          .orderBy("user_id", "session_id")
      }),

    QDef("q_events_json",
      Some(s"""SELECT k_bucket, COUNT(*) AS n, ${Sq.dsum("value")} AS total_value
              |FROM (SELECT CAST(CAST(props->>'k' AS INT) // 10 AS INT) AS k_bucket, value FROM events)
              |GROUP BY k_bucket ORDER BY k_bucket""".stripMargin),
      // from_json with a declared schema: ONE Jackson parse into a struct
      // per row (projection-pruned), vs get_json_object re-walking the
      // document per extracted path — the difference compounds when props
      // is parsed for every row of the fact table at scale
      (s, dir) => t(s, dir, "events")
        .select((from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k") / 10)
          .cast(IntegerType).as("k_bucket"), col("value"))
        .groupBy("k_bucket")
        .agg(count(lit(1)).as("n"), dsumd(col("value")).as("total_value"))
        .orderBy("k_bucket")),

    // as-of join (pandas merge_asof): each purchase gets the latest
    // signup at-or-before it, per user — see operators.AsOf
    QDef("q_asof_join",
      Some(s"""WITH $evSql,
             |l AS (SELECT event_id, user_id, ts, value, 1 AS _side, NULL::TIMESTAMP AS rts
             |  FROM ev WHERE event_type = 'purchase'),
             |r AS (SELECT event_id, user_id, ts, NULL::DOUBLE AS value, 0 AS _side, ts AS rts
             |  FROM ev WHERE event_type = 'signup'),
             |u AS (SELECT * FROM l UNION ALL SELECT * FROM r),
             |f AS (SELECT *, last_value(rts IGNORE NULLS) OVER (
             |    PARTITION BY user_id ORDER BY ts, _side, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
             |  FROM u)
             |SELECT event_id, user_id, ts, last_signup_ts,
             |  CASE WHEN last_signup_ts IS NOT NULL
             |       THEN epoch_us(ts) - epoch_us(last_signup_ts) END AS us_since_signup
             |FROM f WHERE _side = 1 ORDER BY user_id, ts, event_id""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts", "value")
        val signups = e.filter(col("event_type") === "signup")
          .select("event_id", "user_id", "ts")
        AsOf.join(purchases, signups, "user_id", "ts", "event_id", Seq("ts"))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("right_ts").as("last_signup_ts"),
            when(col("right_ts").isNotNull,
              unix_micros(col("ts")) - unix_micros(col("right_ts"))).as("us_since_signup"))
          .orderBy("user_id", "ts", "event_id")
      }),

    // merge_asof(direction='forward'): the earliest signup AT OR AFTER
    // each purchase — same single-shuffle window machinery, reversed
    // traversal (AsOf.join scaladoc)
    QDef("q_asof_forward",
      Some(s"""WITH $evSql,
             |l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
             |r AS (SELECT ts AS rts, user_id FROM ev WHERE event_type = 'signup')
             |SELECT l.event_id, l.user_id, l.ts, MIN(r.rts) AS next_signup_ts,
             |  CASE WHEN MIN(r.rts) IS NOT NULL
             |       THEN epoch_us(MIN(r.rts)) - epoch_us(l.ts) END AS us_until_signup
             |FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.rts >= l.ts
             |GROUP BY l.event_id, l.user_id, l.ts
             |ORDER BY l.user_id, l.ts, l.event_id""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = e.filter(col("event_type") === "signup")
          .select("event_id", "user_id", "ts")
        AsOf.join(purchases, signups, "user_id", "ts", "event_id", Seq("ts"),
            direction = "forward")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("right_ts").as("next_signup_ts"),
            when(col("right_ts").isNotNull,
              unix_micros(col("right_ts")) - unix_micros(col("ts"))).as("us_until_signup"))
          .orderBy("user_id", "ts", "event_id")
      }),

    // merge_asof(direction='nearest'): whichever signup is closer in
    // absolute time, equal distances preferring the backward match
    // (pandas' rule) — both traversals evaluate over ONE partitioned
    // frame (one exchange, two window sorts; AsOf.join scaladoc). The
    // oracle states the semantics directly: per purchase, the signup ts
    // minimizing (abs gap, ts) via a LATERAL top-1.
    QDef("q_asof_nearest",
      Some(s"""WITH $evSql,
             |l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
             |r AS (SELECT ts AS rts, user_id FROM ev WHERE event_type = 'signup')
             |SELECT l.event_id, l.user_id, l.ts, s.rts AS nearest_signup_ts,
             |  CASE WHEN s.rts IS NOT NULL
             |       THEN epoch_us(l.ts) - epoch_us(s.rts) END AS us_from_signup
             |FROM l LEFT JOIN LATERAL (
             |  SELECT r.rts FROM r WHERE r.user_id = l.user_id
             |  ORDER BY ABS(epoch_us(r.rts) - epoch_us(l.ts)), r.rts LIMIT 1) s ON TRUE
             |ORDER BY l.user_id, l.ts, l.event_id""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = e.filter(col("event_type") === "signup")
          .select("event_id", "user_id", "ts")
        AsOf.join(purchases, signups, "user_id", "ts", "event_id", Seq("ts"),
            direction = "nearest")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("right_ts").as("nearest_signup_ts"),
            when(col("right_ts").isNotNull,
              unix_micros(col("ts")) - unix_micros(col("right_ts"))).as("us_from_signup"))
          .orderBy("user_id", "ts", "event_id")
      }),

    // merge_asof(tolerance=...): a backward match farther than 7 days is
    // nulled out (row kept, unmatched — pandas semantics)
    QDef("q_asof_tolerance",
      Some(s"""WITH $evSql,
             |l AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
             |r AS (SELECT ts AS rts, user_id FROM ev WHERE event_type = 'signup')
             |SELECT l.event_id, l.user_id, l.ts, MAX(r.rts) AS last_signup_ts,
             |  CASE WHEN MAX(r.rts) IS NOT NULL
             |       THEN epoch_us(l.ts) - epoch_us(MAX(r.rts)) END AS us_since_signup
             |FROM l LEFT JOIN r ON l.user_id = r.user_id AND r.rts <= l.ts
             |  AND epoch_us(l.ts) - epoch_us(r.rts) <= 604800000000
             |GROUP BY l.event_id, l.user_id, l.ts
             |ORDER BY l.user_id, l.ts, l.event_id""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val signups = e.filter(col("event_type") === "signup")
          .select("event_id", "user_id", "ts")
        AsOf.join(purchases, signups, "user_id", "ts", "event_id", Seq("ts"),
            toleranceUs = Some(604800000000L))
          .select(col("event_id"), col("user_id"), col("ts"),
            col("right_ts").as("last_signup_ts"),
            when(col("right_ts").isNotNull,
              unix_micros(col("ts")) - unix_micros(col("right_ts"))).as("us_since_signup"))
          .orderBy("user_id", "ts", "event_id")
      }),

    QDef("q_events_funnel",
      Some(s"""WITH $evSql,
             |su AS (SELECT user_id, MIN(ts) AS signup_ts FROM ev
             |  WHERE event_type = 'signup' GROUP BY 1),
             |pu AS (SELECT su.user_id, MIN(e.ts) AS first_purchase_ts
             |  FROM su JOIN ev e ON e.user_id = su.user_id
             |    AND e.event_type = 'purchase' AND e.ts >= su.signup_ts
             |  GROUP BY 1)
             |SELECT su.user_id, su.signup_ts, pu.first_purchase_ts,
             |  CASE WHEN pu.first_purchase_ts IS NOT NULL
             |       THEN epoch_us(pu.first_purchase_ts) - epoch_us(su.signup_ts) END AS us_to_convert
             |FROM su LEFT JOIN pu ON su.user_id = pu.user_id
             |ORDER BY su.user_id""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts")).as("signup_ts"))
        val pu = su.join(e.select(col("user_id"), col("ts"), col("event_type")),
            Seq("user_id"))
          .filter(col("event_type") === "purchase" && col("ts") >= col("signup_ts"))
          .groupBy("user_id").agg(min(col("ts")).as("first_purchase_ts"))
        su.join(pu, Seq("user_id"), "left")
          .select(col("user_id"), col("signup_ts"), col("first_purchase_ts"),
            when(col("first_purchase_ts").isNotNull,
              unix_micros(col("first_purchase_ts")) - unix_micros(col("signup_ts")))
              .as("us_to_convert"))
          .orderBy("user_id")
      }),

    // pandas rolling(on=time) — a TIME-based (not row-count) trailing
    // window: per user, the 1-hour rolling count/sum of purchase value.
    // rangeBetween on the microsecond position gives the exact
    // semantics; ONE shuffle on user_id, and the frame bound keeps each
    // task's working set at the events inside the hour, not the user's
    // whole history.
    QDef("q_rolling_time",
      Some(s"""WITH $evSql,
             |p AS (SELECT event_id, user_id, ts, value, epoch_us(ts) AS us
             |  FROM ev WHERE event_type = 'purchase')
             |SELECT event_id, user_id, ts,
             |  COUNT(*) OVER w AS n_1h,
             |  CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))) OVER w, 6) AS DOUBLE) AS sum_1h
             |FROM p
             |WINDOW w AS (PARTITION BY user_id ORDER BY us
             |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, ts, event_id""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("us"))
          .rangeBetween(-3600000000L, Window.currentRow)
        ev(s, dir).filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"),
            unix_micros(col("ts")).as("us"))
          .select(col("event_id"), col("user_id"), col("ts"),
            count(lit(1)).over(w).as("n_1h"),
            emit6(sum(col("value").cast(graft.util.D.dec25)).over(w)).as("sum_1h"))
          .orderBy("user_id", "ts", "event_id")
      }),

    // Point-in-interval join (graft.operators.RangeJoin): every purchase
    // opens a ±5-minute attribution window; count, per event type, the
    // events landing inside ANY window. Both sides are corpus-sized, so
    // the naive `lo <= ts AND ts <= hi` join would plan as a nested-loop
    // cartesian; the banded form is an ordinary equi-join shuffle (see
    // RangeJoin scaladoc for the cost model). The oracle states the same
    // semantics as the naive BETWEEN join — DuckDB plans it as an IEJoin.
    QDef("q_range_join",
      Some(s"""WITH $evSql,
             |win AS (SELECT event_id AS win_id,
             |    epoch_us(ts) - 300000000 AS lo_us, epoch_us(ts) + 300000000 AS hi_us
             |  FROM ev WHERE event_type = 'purchase'),
             |m AS (SELECT e.event_type, e.event_id, e.value
             |  FROM ev e JOIN win w ON epoch_us(e.ts) BETWEEN w.lo_us AND w.hi_us)
             |SELECT event_type, COUNT(*) AS n_matches,
             |  COUNT(DISTINCT event_id) AS n_events,
             |  ${Sq.dsum("value")} AS total_value
             |FROM m GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val pts = e.select(col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("pos_us"))
        val win = e.filter(col("event_type") === "purchase")
          .select(col("event_id").as("win_id"),
            (unix_micros(col("ts")) - 300000000L).as("lo_us"),
            (unix_micros(col("ts")) + 300000000L).as("hi_us"))
        // band = the max window span (10 min) -> each window lands on at
        // most 2 bands
        RangeJoin.pointInInterval(pts, "pos_us", win, "lo_us", "hi_us",
            bandWidth = 600000000L)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_matches"),
            countDistinct(col("event_id")).as("n_events"),
            dsumd(col("value")).as("total_value"))
          .orderBy("event_type")
      }),

    // Weekly cohort retention: users cohorted by first-active week
    // (date_trunc 'week' — Monday in both engines); each (cohort_week,
    // week_offset) cell counts the distinct users active that week,
    // plus the retention fraction of the cohort. Scale: ONE corpus
    // scan — the (user, week) distinct is the only corpus-sized
    // shuffle; the cohort week is a user-partitioned window MIN over
    // the deduped rows (the predecessor derived cohorts and cohort
    // sizes as separate aggregate branches and re-joined them, which
    // planned THREE FileScans of the events table with no exchange
    // reuse — a 3× corpus read at 100 TB, caught by plan audit);
    // cohort_size needs no join either: every user appears in their
    // own cohort week, so it IS the offset-0 cell, read back via a
    // window over the bounded (weeks²) cell table. week_offset
    // division is exact (both operands week-truncated, so the day
    // diff is a multiple of 7 — small-int doubles are exact in IEEE).
    QDef("q_events_retention",
      Some(s"""WITH $evSql,
             |uw AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week_start FROM ev),
             |coh AS (SELECT user_id, MIN(week_start) AS cohort_week FROM uw GROUP BY 1),
             |cs AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size FROM coh GROUP BY 1),
             |cell AS (SELECT c.cohort_week,
             |    CAST(CAST(date_diff('day', c.cohort_week, u.week_start) AS DOUBLE) / 7 AS BIGINT) AS week_offset,
             |    CAST(COUNT(*) AS BIGINT) AS n_users
             |  FROM uw u JOIN coh c ON u.user_id = c.user_id GROUP BY 1, 2)
             |SELECT cell.cohort_week, cell.week_offset, cell.n_users,
             |  ROUND(CAST(cell.n_users AS DOUBLE) / cs.cohort_size, 6) AS retention
             |FROM cell JOIN cs ON cell.cohort_week = cs.cohort_week
             |ORDER BY cell.cohort_week, cell.week_offset""".stripMargin),
      (s, dir) => {
        val cell = ev(s, dir)
          .select(col("user_id"), date_trunc("week", col("ts")).as("week_start"))
          .distinct()
          .withColumn("cohort_week",
            min(col("week_start")).over(Window.partitionBy("user_id")))
          .groupBy(col("cohort_week"),
            (datediff(col("week_start"), col("cohort_week")).cast(DoubleType) / 7)
              .cast(LongType).as("week_offset"))
          .agg(count(lit(1)).cast(LongType).as("n_users"))
        cell
          .withColumn("cohort_size",
            max(when(col("week_offset") === 0, col("n_users")))
              .over(Window.partitionBy("cohort_week")))
          .select(col("cohort_week"), col("week_offset"), col("n_users"),
            graft.util.D.r(col("n_users").cast(DoubleType) / col("cohort_size"), 6)
              .as("retention"))
          .orderBy("cohort_week", "week_offset")
      }),

    // Hourly traffic spike detection (the ops-monitoring counterpart of
    // q_anomaly_mad's robust form): per event type, hours whose event
    // count exceeds mean + 3σ of that type's hourly history. Scale: one
    // map-side-combined corpus aggregation to (type, hour) cardinality;
    // the stats and the flag join run entirely on that bounded hourly
    // table (AQE-planned). Exact decimal moments (dsumd/dsumsq), mu/sd
    // rounded 6dp before the threshold compare so both engines flag
    // identically.
    QDef("q_events_anomaly",
      Some(s"""WITH $evSql,
             |h AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
             |    CAST(COUNT(*) AS BIGINT) AS n
             |  FROM ev GROUP BY 1, 2),
             |st AS (SELECT event_type, ${Sq.mean("n")} AS mu,
             |    ROUND(SQRT(${Sq.varSamp("n")}), 6) AS sd
             |  FROM h GROUP BY 1)
             |SELECT h.event_type, h.window_start, h.n, st.mu, st.sd,
             |  CAST(CASE WHEN h.n > st.mu + 3 * st.sd THEN 1 ELSE 0 END AS INT) AS is_spike
             |FROM h JOIN st ON h.event_type = st.event_type
             |ORDER BY h.event_type, h.window_start""".stripMargin),
      (s, dir) => {
        val h = ev(s, dir)
          .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("window_start"))
          .agg(count(lit(1)).cast(LongType).as("n"))
        val cnt = count(lit(1))
        val sm = dsumd(col("n"))
        val sq = dsumsq(col("n"))
        val st = h.groupBy("event_type")
          .agg(r(sm / cnt).as("mu"), r(sqrt(varSamp(sm, sq, cnt)), 6).as("sd"))
        h.join(st, Seq("event_type"))
          .select(col("event_type"), col("window_start"), col("n"), col("mu"), col("sd"),
            // when/otherwise, not a boolean cast: a single-window type
            // has sd = NULL (var_samp of one row — both engines), and
            // the oracle's CASE WHEN maps the NULL comparison to 0
            // where a cast would keep NULL
            when(col("n") > col("mu") + lit(3) * col("sd"), 1)
              .otherwise(0).cast("int").as("is_spike"))
          .orderBy("event_type", "window_start")
      }),

    // join-key skew diagnostic — the salting / AQE-skew-join decision
    // input for any user_id-keyed join or sessionization: the 10
    // heaviest keys with their corpus share and multiple-of-average.
    // ONE map-side-combined key-count reduction, a 1-row stats
    // aggregate, and a bounded top-k heap (TakeOrderedAndProject) —
    // the events table is never globally sorted
    QDef("q_key_skew",
      Some(s"""WITH $evSql,
             |kc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt FROM ev GROUP BY 1),
             |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM kc),
             |top AS (SELECT user_id, cnt FROM kc ORDER BY cnt DESC, user_id LIMIT 10)
             |SELECT t.user_id, t.cnt, s.n_keys, s.n_rows,
             |  ROUND(CAST(t.cnt AS DOUBLE) * 1000000.0 / CAST(s.n_rows AS DOUBLE), 2) AS share_ppm,
             |  ROUND(CAST(t.cnt AS DOUBLE) * CAST(s.n_keys AS DOUBLE) / CAST(s.n_rows AS DOUBLE), 4) AS x_avg
             |FROM top t, st s ORDER BY t.cnt DESC, t.user_id""".stripMargin),
      (s, dir) => {
        val kc = ev(s, dir).groupBy("user_id").agg(count(lit(1)).as("cnt"))
        val st = kc.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"))
        kc.orderBy(col("cnt").desc, col("user_id")).limit(10)
          .crossJoin(broadcast(st))
          .select(col("user_id"), col("cnt"), col("n_keys"), col("n_rows"),
            r(col("cnt").cast(DoubleType) * lit(1e6) / col("n_rows").cast(DoubleType), 2).as("share_ppm"),
            r(col("cnt").cast(DoubleType) * col("n_keys").cast(DoubleType) / col("n_rows").cast(DoubleType), 4).as("x_avg"))
          .orderBy(col("cnt").desc, col("user_id"))
      }),

    // session-gap calibration stats — the measurement BEHIND
    // q_events_sessionize's 30-minute threshold: the distribution of
    // same-user inter-event gaps (p50/p90/p99 + the fraction a given
    // cutoff would split). One user-keyed lag window over the corpus;
    // the exact percentiles buffer the gap column (the documented
    // superlinear-at-scale exact form — approx_percentile is the
    // q_qcut-convention swap); emits ONE row
    QDef("q_session_gap_stats",
      Some(s"""WITH $evSql,
             |g AS (SELECT epoch_us(ts) - epoch_us(LAG(ts) OVER
             |    (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
             |  FROM ev),
             |gg AS (SELECT gap_us FROM g WHERE gap_us IS NOT NULL)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_gaps,
             |  CAST(ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.5), 0) AS BIGINT) AS p50_us,
             |  CAST(ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.9), 0) AS BIGINT) AS p90_us,
             |  CAST(ROUND(quantile_cont(CAST(gap_us AS DOUBLE), 0.99), 0) AS BIGINT) AS p99_us,
             |  ROUND(CAST(SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END) AS DOUBLE)
             |    / COUNT(*), 6) AS frac_over_30m
             |FROM gg""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val g = ev(s, dir)
          .select((unix_micros(col("ts")) -
            unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
          .filter(col("gap_us").isNotNull)
        g.agg(count(lit(1)).cast(LongType).as("n_gaps"),
          round(percentile(col("gap_us").cast(DoubleType), lit(0.5)), 0).cast(LongType).as("p50_us"),
          round(percentile(col("gap_us").cast(DoubleType), lit(0.9)), 0).cast(LongType).as("p90_us"),
          round(percentile(col("gap_us").cast(DoubleType), lit(0.99)), 0).cast(LongType).as("p99_us"),
          r(sum(when(col("gap_us") > 1800000000L, 1L).otherwise(0L)).cast(DoubleType) /
            count(lit(1)), 6).as("frac_over_30m"))
      }),

    // per-type user burstiness (variance-to-mean dispersion of per-user
    // event counts — the overdispersion diagnostic behind skew
    // handling and rate limits: dispersion ≈ 1 is Poisson traffic, ≫ 1
    // means hot users): per-user counts (ONE corpus shuffle), exact
    // decimal moments on the user-cardinality table, 6dp-rounded
    // mean/variance before the ratio
    QDef("q_user_burstiness",
      Some(s"""WITH $evSql,
             |uc AS (SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM ev GROUP BY 1, 2),
             |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
             |    ROUND(CAST(SUM(CAST(c AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS mean_c,
             |    ROUND((CAST(SUM(CAST(c AS DECIMAL(25,6)) * CAST(c AS DECIMAL(25,6))) AS DOUBLE)
             |      - CAST(SUM(CAST(c AS DECIMAL(25,6))) AS DOUBLE)
             |        * CAST(SUM(CAST(c AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*)) / COUNT(*), 6) AS var_c
             |  FROM uc GROUP BY 1)
             |SELECT event_type, n_users, mean_c, var_c,
             |  ROUND(var_c / mean_c, 6) AS dispersion
             |FROM m ORDER BY event_type""".stripMargin),
      (s, dir) => {
        val uc = ev(s, dir).groupBy("event_type", "user_id")
          .agg(count(lit(1)).cast(LongType).as("c"))
        val dec = col("c").cast(graft.util.D.dec25)
        uc.groupBy("event_type")
          .agg(count(lit(1)).cast(LongType).as("n_users"),
            sum(dec).as("s1"), sum(dec * dec).as("s2"))
          .select(col("event_type"), col("n_users"),
            r(col("s1").cast(DoubleType) / col("n_users"), 6).as("mean_c"),
            r((col("s2").cast(DoubleType) -
              col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n_users")) /
              col("n_users"), 6).as("var_c"))
          .withColumn("dispersion", r(col("var_c") / col("mean_c"), 6))
          .orderBy("event_type")
      }),

    // PSI distribution drift (population stability index — the
    // standard ML-monitoring metric for "did this feature's
    // distribution move"): the REFERENCE slice (even event_id — the
    // deployed snapshot) defines decile bins via exact quantile
    // boundaries (9 bounded doubles collected once, re-entering as a
    // codegen'd literal chain — the q_qcut shape); both slices bin
    // through the identical chain; per bin the two shares (Laplace-
    // smoothed so an empty bin can't produce ±∞) and the PSI term
    // (p−q)·ln(p/q), 6dp-rounded before the total sums them. PSI > 0.2
    // is the conventional "investigate" threshold. Corpus pays two
    // map-side-combined binning aggregations; all PSI math runs on the
    // 10-row bin table
    QDef("q_psi_drift",
      Some(s"""WITH $evSql,
             |th AS (SELECT list_transform(
             |    quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
             |    t -> ROUND(CAST(t AS DOUBLE), 4)) AS th
             |  FROM ev WHERE event_id % 2 = 0),
             |binned AS (SELECT event_id % 2 AS slice,
             |    1 + len(list_filter(th.th, t -> t < e.value)) AS bin
             |  FROM ev e, th WHERE e.value IS NOT NULL),
             |cell AS (SELECT bin,
             |    SUM(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS n_ref,
             |    SUM(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS n_cur
             |  FROM binned GROUP BY 1),
             |tot AS (SELECT SUM(n_ref) AS tr, SUM(n_cur) AS tc FROM cell),
             |terms AS (SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cur AS BIGINT) AS n_cur,
             |    ROUND((n_ref + 1.0) / (tot.tr + 10.0), 6) AS p_ref,
             |    ROUND((n_cur + 1.0) / (tot.tc + 10.0), 6) AS p_cur
             |  FROM cell, tot)
             |SELECT bin, n_ref, n_cur, p_ref, p_cur,
             |  ROUND((p_cur - p_ref) * LN(p_cur / p_ref), 6) AS psi_term
             |FROM terms ORDER BY bin""".stripMargin),
      (s, dir) => {
        // a NULL value has no bin (Spark would make a NULL bin, SQL's
        // list_filter would silently call it bin 1) — missing values
        // are out of scope for a PSI over the feature, both engines
        val e = ev(s, dir).select(col("event_id"), col("value"))
          .filter(col("value").isNotNull)
        val ths = e.filter(col("event_id") % 2 === 0)
          .agg(percentile(col("value"), array((1 to 9).map(i => lit(i / 10.0)): _*)).as("th"))
          .select(transform(col("th"), x => r(x, 4)).as("th"))
          .head().getSeq[Double](0)
        val bin = ths.map(t0 => (col("value") > lit(t0)).cast("int")).reduce(_ + _) + lit(1)
        val cell = e.select((col("event_id") % 2).as("slice"), bin.as("bin"))
          .groupBy("bin")
          .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("n_ref"),
            sum(when(col("slice") === 1, 1L).otherwise(0L)).as("n_cur"))
        val tot = cell.agg(sum(col("n_ref")).as("tr"), sum(col("n_cur")).as("tc"))
        val pRef = r((col("n_ref") + lit(1.0)) / (col("tr") + lit(10.0)), 6)
        val pCur = r((col("n_cur") + lit(1.0)) / (col("tc") + lit(10.0)), 6)
        cell.crossJoin(broadcast(tot))
          .select(col("bin").cast(LongType).as("bin"),
            col("n_ref").cast(LongType).as("n_ref"), col("n_cur").cast(LongType).as("n_cur"),
            pRef.as("p_ref"), pCur.as("p_cur"))
          .withColumn("psi_term", r((col("p_cur") - col("p_ref")) *
            log(col("p_cur") / col("p_ref")), 6))
          .orderBy("bin")
      }),

    // RFM segmentation (the classic recency/frequency/monetary customer
    // scoring): per purchasing user recency (μs since their last
    // purchase, against the corpus max-purchase-ts "now"), purchase
    // count, and exact decimal spend; each dimension scored 1-4 by its
    // EXACT quartiles over the per-user table (recency scored inversely
    // so 4 = most recent). Output = per (r, f, m) segment user count +
    // mean spend. ONE action: "now" and the three quartile triples are
    // 1-row aggregates re-entering as broadcast cross joins (not
    // collect-and-literal, which costs a full extra plan per collect —
    // the old 3-action form rescanned the corpus once per stage), so
    // the user-cardinality aggregate's exchange is planned once and
    // REUSED by all its consumers: the corpus pays a single
    // purchase-filtered scan. Scoring compares against element_at on
    // the broadcast 3-element arrays — plain codegen'd comparisons,
    // no interpreted HOF on the scored rows.
    QDef("q_orders_rfm",
      Some(s"""WITH $evSql,
             |u AS (SELECT user_id, MAX(ts) AS last_ts, CAST(COUNT(*) AS BIGINT) AS freq,
             |    CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 6) AS DOUBLE) AS mon
             |  FROM ev WHERE event_type = 'purchase' GROUP BY 1),
             |nw AS (SELECT MAX(last_ts) AS now FROM u),
             |ur AS (SELECT u.*, epoch_us(nw.now) - epoch_us(u.last_ts) AS rec FROM u, nw),
             |qs AS (SELECT
             |    list_transform(quantile_cont(CAST(rec AS DOUBLE), [0.25, 0.5, 0.75]),
             |      t -> ROUND(CAST(t AS DOUBLE), 4)) AS rq,
             |    list_transform(quantile_cont(CAST(freq AS DOUBLE), [0.25, 0.5, 0.75]),
             |      t -> ROUND(CAST(t AS DOUBLE), 4)) AS fq,
             |    list_transform(quantile_cont(mon, [0.25, 0.5, 0.75]),
             |      t -> ROUND(CAST(t AS DOUBLE), 4)) AS mq
             |  FROM ur),
             |scored AS (SELECT
             |    1 + len(list_filter(qs.rq, t -> CAST(ur.rec AS DOUBLE) < t)) AS r_score,
             |    1 + len(list_filter(qs.fq, t -> CAST(ur.freq AS DOUBLE) > t)) AS f_score,
             |    1 + len(list_filter(qs.mq, t -> ur.mon > t)) AS m_score,
             |    ur.mon FROM ur, qs)
             |SELECT CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
             |  CAST(m_score AS BIGINT) AS m_score, CAST(COUNT(*) AS BIGINT) AS n_users,
             |  ROUND(CAST(SUM(CAST(mon AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS avg_monetary
             |FROM scored GROUP BY 1, 2, 3 ORDER BY r_score, f_score, m_score""".stripMargin),
      (s, dir) => {
        val u = ev(s, dir).filter(col("event_type") === "purchase")
          .groupBy("user_id")
          .agg(max(col("ts")).as("last_ts"), count(lit(1)).cast(LongType).as("freq"),
            graft.util.D.emit6(sum(col("value").cast(graft.util.D.dec25))).as("mon"))
        val nw = u.agg(max(col("last_ts")).as("now_ts"))
        val ur = u.crossJoin(broadcast(nw))
          .withColumn("rec",
            (unix_micros(col("now_ts")) - unix_micros(col("last_ts"))).cast(DoubleType))
          .drop("now_ts")
        def quart(c: org.apache.spark.sql.Column) =
          percentile(c, array(lit(0.25), lit(0.5), lit(0.75)))
        val qs = ur.agg(quart(col("rec")).as("rq"),
            quart(col("freq").cast(DoubleType)).as("fq"), quart(col("mon")).as("mq"))
          .select(transform(col("rq"), x => r(x, 4)).as("rq"),
            transform(col("fq"), x => r(x, 4)).as("fq"),
            transform(col("mq"), x => r(x, 4)).as("mq"))
        def scoreUp(c: org.apache.spark.sql.Column, arr: String) =
          (1 to 3).map(i => (c > element_at(col(arr), i)).cast("int")).reduce(_ + _) + lit(1)
        def scoreDown(c: org.apache.spark.sql.Column, arr: String) =
          (1 to 3).map(i => (c < element_at(col(arr), i)).cast("int")).reduce(_ + _) + lit(1)
        ur.crossJoin(broadcast(qs))
          .select(scoreDown(col("rec"), "rq").cast(LongType).as("r_score"),
            scoreUp(col("freq").cast(DoubleType), "fq").cast(LongType).as("f_score"),
            scoreUp(col("mon"), "mq").cast(LongType).as("m_score"),
            col("mon"))
          .groupBy("r_score", "f_score", "m_score")
          .agg(count(lit(1)).cast(LongType).as("n_users"),
            sum(col("mon").cast(graft.util.D.dec25)).as("ms"))
          .select(col("r_score"), col("f_score"), col("m_score"), col("n_users"),
            r(col("ms").cast(DoubleType) / col("n_users"), 6).as("avg_monetary"))
          .orderBy("r_score", "f_score", "m_score")
      }),

    // user-journey transition matrix (first-order Markov over each
    // user's time-ordered event sequence): per (from, to) event-type
    // pair the transition count and conditional probability — the
    // product-analytics "where do users go next" table; ONE user-keyed
    // window (lag) and one KB-sized (types × types) aggregation, the
    // per-from totals derived FROM that table
    QDef("q_events_markov",
      Some(s"""WITH $evSql,
             |seq AS (SELECT event_type AS to_type,
             |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type
             |  FROM ev),
             |tc AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2),
             |ft AS (SELECT from_type, SUM(n) AS tot FROM tc GROUP BY 1)
             |SELECT tc.from_type, tc.to_type, tc.n,
             |  ROUND(CAST(tc.n AS DOUBLE) / ft.tot, 6) AS p
             |FROM tc JOIN ft USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin),
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val seq0 = ev(s, dir)
          .select(col("event_type").as("to_type"),
            lag(col("event_type"), 1).over(w).as("from_type"))
          .filter(col("from_type").isNotNull)
        val tc = seq0.groupBy("from_type", "to_type")
          .agg(count(lit(1)).cast(LongType).as("n"))
        // per-from totals via a window over the KB-sized (types×types)
        // table — an agg+self-join here re-planned tc's corpus subtree
        // for a second consumer
        tc.withColumn("tot", sum(col("n")).over(Window.partitionBy("from_type")))
          .select(col("from_type"), col("to_type"), col("n"),
            r(col("n").cast(DoubleType) / col("tot"), 6).as("p"))
          .orderBy("from_type", "to_type")
      }),

    // ordered multi-step funnel (signup → view → click → purchase):
    // per user the earliest CHAINED timestamp of each step (step k
    // counts only at-or-after the user's step-k−1 time — the strict
    // product-analytics funnel, not four independent mins), reported
    // as per-step reached-user counts + conversion from step 1. Four
    // chained min-aggregations, each a user-keyed join of the
    // user-cardinality frontier against ONE type-filtered event slice;
    // the corpus-sized work is the four filtered scans (pushed-down
    // type predicate), every join key-based on user_id
    QDef("q_funnel_steps",
      Some(s"""WITH $evSql,
             |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT s1.user_id, MIN(e.ts) AS t2 FROM s1 JOIN ev e
             |  ON e.user_id = s1.user_id AND e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY 1),
             |s3 AS (SELECT s2.user_id, MIN(e.ts) AS t3 FROM s2 JOIN ev e
             |  ON e.user_id = s2.user_id AND e.event_type = 'click' AND e.ts >= s2.t2 GROUP BY 1),
             |s4 AS (SELECT s3.user_id, MIN(e.ts) AS t4 FROM s3 JOIN ev e
             |  ON e.user_id = s3.user_id AND e.event_type = 'purchase' AND e.ts >= s3.t3 GROUP BY 1),
             |c AS (SELECT (SELECT COUNT(*) FROM s1) AS n1, (SELECT COUNT(*) FROM s2) AS n2,
             |  (SELECT COUNT(*) FROM s3) AS n3, (SELECT COUNT(*) FROM s4) AS n4)
             |SELECT step, step_name, CAST(n_users AS BIGINT) AS n_users,
             |  ROUND(CAST(n_users AS DOUBLE) / n1, 6) AS conv_from_start
             |FROM c, (VALUES (1, 'signup'), (2, 'view'), (3, 'click'), (4, 'purchase'))
             |  AS steps(step, step_name),
             |LATERAL (SELECT CASE step WHEN 1 THEN n1 WHEN 2 THEN n2
             |  WHEN 3 THEN n3 ELSE n4 END AS n_users)
             |ORDER BY step""".stripMargin),
      (s, dir) => {
        // ONE corpus scan + ONE user_id shuffle. The old form chained
        // four join+agg frames and then counted each frame separately,
        // which re-executed the chain as a tree: step k's count branch
        // re-scanned slices 1..k, 11 filtered corpus scans in all —
        // O(steps²) passes at any scale. Here the chained step times
        // t1..t4 stack as four whole-partition window minima over the
        // SAME user_id partitioning (tk = min ts of its type at-or-after
        // t(k−1); a NULL prior step nulls the comparison, so the strict
        // chaining is preserved bit-for-bit), the per-user roll-up
        // reuses that partitioning with no extra exchange, and the four
        // step counts are non-null counts of one tiny aggregate row.
        val wU = Window.partitionBy("user_id")
        def stepMin(tp: String, after: Option[String]) = min(when(
          after.map(a => col("event_type") === tp && col("ts") >= col(a))
            .getOrElse(col("event_type") === tp), col("ts"))).over(wU)
        val perUser = ev(s, dir)
          .select(col("user_id"), col("ts"), col("event_type"))
          .withColumn("t1", stepMin("signup", None))
          .withColumn("t2", stepMin("view", Some("t1")))
          .withColumn("t3", stepMin("click", Some("t2")))
          .withColumn("t4", stepMin("purchase", Some("t3")))
          .groupBy("user_id")
          .agg(max(col("t1")).as("t1"), max(col("t2")).as("t2"),
            max(col("t3")).as("t3"), max(col("t4")).as("t4"))
        val a = perUser.agg(count(col("t1")).as("n1"), count(col("t2")).as("n2"),
          count(col("t3")).as("n3"), count(col("t4")).as("n4"))
        val stepRows = Seq((1, "signup", "n1"), (2, "view", "n2"),
          (3, "click", "n3"), (4, "purchase", "n4")).map { case (i, nm, c) =>
          struct(lit(i).as("step"), lit(nm).as("step_name"), col(c).as("n_users")) }
        a.select(explode(array(stepRows: _*)).as("st"), col("n1"))
          .select(col("st.step").as("step"), col("st.step_name").as("step_name"),
            col("st.n_users").cast(LongType).as("n_users"),
            r(col("st.n_users").cast(DoubleType) / col("n1"), 6).as("conv_from_start"))
          .orderBy("step")
      }),

    // linear multi-touch attribution (the marketing-analytics step on
    // the same funnel data): each purchase's value splits equally over
    // the user's view/click touches in the preceding hour; per touch
    // type the credited-touch count, reached-purchase count, and total
    // credit, plus an __unattributed__ row for purchases with no
    // preceding touch (full value retained). Per-(purchase, type)
    // credit = round6(value·c_type/n) BEFORE the decimal sum (the Lm
    // rounding convention), so partial-aggregation order can't move
    // the total. ONE user_id-keyed equi-join carries the time predicate
    // (per-user fanout bounded by event rate × horizon, the
    // q_rolling_time argument); everything after runs on the
    // purchase-cardinality credit table.
    QDef("q_events_attribution",
      Some(s"""WITH $evSql,
             |p AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'purchase'),
             |tch AS (SELECT user_id, ts, event_type FROM ev WHERE event_type IN ('view', 'click')),
             |j AS (SELECT p.event_id, p.value, t.event_type AS touch_type
             |  FROM p JOIN tch t ON t.user_id = p.user_id
             |    AND t.ts >= p.ts - INTERVAL 1 HOUR AND t.ts < p.ts),
             |pt AS (SELECT event_id, value, touch_type, COUNT(*) AS c
             |  FROM j GROUP BY 1, 2, 3),
             |n AS (SELECT event_id, SUM(c) AS n FROM pt GROUP BY 1),
             |credit AS (SELECT pt.touch_type, pt.c,
             |    ROUND(pt.value * pt.c / n.n, 6) AS cr
             |  FROM pt JOIN n ON pt.event_id = n.event_id),
             |attributed AS (SELECT touch_type AS credit_to,
             |    CAST(SUM(c) AS BIGINT) AS n_touches,
             |    CAST(COUNT(*) AS BIGINT) AS n_purchases,
             |    CAST(ROUND(SUM(CAST(cr AS DECIMAL(25,6))), 6) AS DOUBLE) AS credit
             |  FROM credit GROUP BY 1),
             |unattr AS (SELECT '__unattributed__' AS credit_to,
             |    CAST(0 AS BIGINT) AS n_touches, CAST(COUNT(*) AS BIGINT) AS n_purchases,
             |    CAST(ROUND(SUM(CAST(value AS DECIMAL(25,6))), 6) AS DOUBLE) AS credit
             |  FROM p WHERE event_id NOT IN (SELECT event_id FROM n))
             |SELECT * FROM (SELECT * FROM attributed UNION ALL SELECT * FROM unattr)
             |ORDER BY credit_to""".stripMargin),
      (s, dir) => {
        val e = ev(s, dir)
        val p = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        val tch = e.filter(col("event_type").isin("view", "click"))
          .select(col("user_id").as("t_user"), col("ts").as("t_ts"),
            col("event_type").as("touch_type"))
        // LEFT OUTER join keeps untouched purchases as touch_type-NULL
        // rows, so the __unattributed__ leg falls out of the SAME
        // grouped table instead of a second purchase scan + anti-join;
        // the per-purchase touch total is a window over the
        // purchase-cardinality group table (one shuffle on event_id)
        // rather than an agg + self-join. Values are unchanged: the
        // NULL-type group exists exactly when a purchase had no touch,
        // and the window total ignores it.
        val j = p.join(tch, col("t_user") === col("user_id") &&
            col("t_ts") >= (col("ts") - expr("INTERVAL 1 HOUR")) && col("t_ts") < col("ts"),
          "left_outer")
        val pt = j.groupBy("event_id", "value", "touch_type")
          .agg(count(lit(1)).as("c"))
        val pt2 = pt.withColumn("n",
          sum(when(col("touch_type").isNotNull, col("c"))).over(Window.partitionBy("event_id")))
        pt2.select(
            coalesce(col("touch_type"), lit("__unattributed__")).as("credit_to"),
            when(col("touch_type").isNotNull, col("c")).otherwise(lit(0L)).as("c"),
            when(col("touch_type").isNotNull, r(col("value") * col("c") / col("n"), 6))
              .otherwise(col("value")).as("cr"))
          .groupBy("credit_to")
          .agg(sum(col("c")).cast(LongType).as("n_touches"),
            count(lit(1)).cast(LongType).as("n_purchases"),
            dsumd(col("cr")).as("credit"))
          .orderBy("credit_to")
      }),

    // salted two-phase distinct count — the skew answer q_key_skew's
    // diagnostic calls for, registered as a checked artifact: the
    // salted plan produces the EXACT per-type distinct-user count
    // (salt = hash(user) % 16 partitions each type's user space, so
    // per-(type, salt) distincts sum exactly — see Scale.saltedNunique);
    // the oracle is the plain COUNT(DISTINCT), proving the rewrite
    // changes the shuffle shape and nothing else
    QDef("q_salted_nunique",
      Some(s"""WITH $evSql
             |SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nunique
             |FROM ev GROUP BY 1 ORDER BY event_type""".stripMargin),
      (s, dir) => graft.util.Scale.saltedNunique(ev(s, dir), "event_type", "user_id", 16)
        .orderBy("event_type")),

    // per-user exponential smoothing (decayed moving average over the
    // last EwmaLags events, α = 1/2): the streaming-telemetry smoother
    // (EWMA anomaly baselines, rate limiters) as ONE user-keyed window
    // pass — the recurrence form is unrollable because α^k weights
    // vanish past EwmaLags, so each row's smoothed value is a fixed
    // linear combination of its lag window. All arithmetic is exact
    // decimal: α = 0.5 makes every weight a terminating decimal
    // (5^k·10^-k, scale ≤ 15 at 16 lags), each term is a
    // DECIMAL(18,6)×DECIMAL(16,15) product (precision 35 — exact in
    // both engines), and term sums are chunked 4-at-a-time with a
    // width-reducing cast so neither engine's decimal-add widening
    // passes 38. No recurrence, no interpreted HOF, no self-join: the
    // corpus cost is one shuffle on user_id and 16 codegen'd lags in a
    // single WindowExec. Scale: per-user state is the 16-row frame;
    // partitions are user-hash, unbounded user counts spread evenly.
    QDef("q_events_ewma", Some(ewmaSql), (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      def wk(k: Int) = lit(new java.math.BigDecimal(0.5).pow(k))
        .cast(DecimalType(16, 15))
      val terms = (0 until EwmaLags).map { k =>
        val lagv = lag(col("value"), k).over(w).cast(DecimalType(18, 6))
        (coalesce(lagv * wk(k), lit(0).cast(DecimalType(35, 21))),
         when(lagv.isNotNull, wk(k)).otherwise(lit(0).cast(DecimalType(16, 15))))
      }
      // chunk-sum cast is (35,21), NOT (32,21): a chunk of four legal
      // DECIMAL(18,6) values (≤1e12 each) needs 14 integer digits;
      // (32,21) leaves only 11, so a large-but-valid value would
      // overflow to NULL in Spark (ANSI off) but raise in DuckDB.
      // Three subsequent (35,21) adds peak at precision 38 — the max
      // both engines carry exactly.
      val num = terms.map(_._1).grouped(4)
        .map(_.reduce(_ + _).cast(DecimalType(35, 21))).reduce(_ + _)
      val den = terms.map(_._2).reduce(_ + _)
      ev(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("value"),
          // den = 0 (every value in the 16-lag window NULL — e.g. a
          // user's first event carrying a null value) must yield NULL
          // like the DuckDB mirror's x/0, not an ANSI DIVIDE_BY_ZERO:
          // Spark 4 ANSI throws for double division too (DirtySpec's
          // degenerate event log pins the class; the dirty fixture had
          // missed it — no user's FIRST event drew the null-value slice)
          r(when(den > lit(0),
            round(num, 6).cast(DoubleType) / den.cast(DoubleType)), 6).as("ewma"))
        .orderBy("user_id", "event_id")
    })
  )

  /** Number of lag terms the EWMA unrolls (α^16 < 2e-5 — below the 6dp
    * emit precision for any value in the telemetry envelope). A def,
    * not a val: it is read during `defs` initialization, which runs
    * before later-declared vals would be assigned. Shared with the
    * streaming twin (`streaming.Ewma.Lags` references this), so the
    * batch window and the stateful fold cannot silently diverge. */
  private[graft] def EwmaLags = 16

  /** DuckDB mirror of q_events_ewma — the same 16-lag unrolled window,
    * decimal-exact with the identical 4-chunk add grouping. */
  private lazy val ewmaSql: String = {
    def wkLit(k: Int) =
      s"CAST(${new java.math.BigDecimal(0.5).pow(k).toPlainString} AS DECIMAL(16,15))"
    def lagK(k: Int) = s"LAG(value, $k) OVER w"
    val terms = (0 until EwmaLags).map { k =>
      s"COALESCE(CAST(${lagK(k)} AS DECIMAL(18,6)) * ${wkLit(k)}, CAST(0 AS DECIMAL(35,21)))"
    }
    val num = terms.grouped(4)
      .map(g => s"CAST(${g.mkString(" + ")} AS DECIMAL(35,21))").mkString(" + ")
    val den = (0 until EwmaLags).map { k =>
      s"CASE WHEN ${lagK(k)} IS NOT NULL THEN ${wkLit(k)} ELSE CAST(0 AS DECIMAL(16,15)) END"
    }.mkString(" + ")
    s"""WITH $evSql
       |SELECT user_id, event_id, ts, value,
       |  ROUND(CAST(ROUND($num, 6) AS DOUBLE) / CAST($den AS DOUBLE), 6) AS ewma
       |FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |ORDER BY user_id, event_id""".stripMargin
  }
}
