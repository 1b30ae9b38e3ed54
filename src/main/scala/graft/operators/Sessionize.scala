package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream (engine extension: the
  * incremental/streaming-shaped capability the reference approximates with
  * request-time re-fetch, SURVEY §2.9).
  *
  * Batch formulation: a session starts whenever the gap to the previous event
  * of the same user exceeds the timeout; session id = running count of starts.
  * Two window passes over one shuffle by user — no state explosion at scale.
  * The streaming formulation lives in graft.streaming (mapGroupsWithState).
  */
object Sessionize {

  /** Assign `session_id` (per user, 0-based) to each event. */
  def assign(events: DataFrame, userCol: String, tsCol: String,
             gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(tsCol).asc)
    val prevTs = lag(col(tsCol), 1).over(byUser)
    val isStart = when(prevTs.isNull ||
      col(tsCol).cast("timestamp").cast("double") -
        prevTs.cast("timestamp").cast("double") > gapMinutes * 60L, 1L)
      .otherwise(0L)
    events
      .withColumn("__start", isStart)
      .withColumn("session_id",
        sum(col("__start")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__start")
  }

  /** Per-session rollup: bounds, event count, value sum. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapMinutes: Int): DataFrame = {
    assign(events, userCol, tsCol, gapMinutes)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Ordered FUNNEL analysis — the product-analytics staple over an event
    * log: for each user, how far through `steps` they progressed IN ORDER
    * (each step's event must occur STRICTLY after the previous step's
    * matched time). Matching is greedy-earliest, which is optimal: taking
    * the earliest qualifying occurrence of step i can only enlarge the
    * window in which step i+1 may qualify, so greedy reaches the maximum
    * depth any matching could.
    *
    * Output: (userCol, t_1..t_k nullable match times, steps_reached).
    * t_i non-null implies t_{i−1} non-null by construction, so
    * `steps_reached` is simply the non-null count.
    *
    * Scale shape: one filtered partial-agg + one user-keyed join PER STEP
    * (k is small and fixed); the event-type filter pushes into each scan,
    * so step i reads only its own events. No windows, no per-user event
    * collection — a user with a million events costs map-side combine,
    * never a fat window partition. */
  def funnelPerUser(events: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val users = events.select(col(userCol)).distinct()
    val matched = steps.zipWithIndex.foldLeft(users) {
      case (acc, (step, i)) =>
        val tPrev = if (i == 0) lit(null) else col(s"t_$i")
        val cand = events.filter(col(typeCol) === step)
          .select(col(userCol), col(tsCol).as("__ts"))
        val scoped =
          if (i == 0) cand
          else cand.join(acc.select(col(userCol), tPrev.as("__prev"))
              .filter(col("__prev").isNotNull), Seq(userCol))
            .filter(col("__ts") > col("__prev"))
        val ti = scoped.groupBy(col(userCol))
          .agg(min(col("__ts")).as(s"t_${i + 1}"))
        acc.join(ti, Seq(userCol), "left")
    }
    matched.withColumn("steps_reached",
      steps.indices.map(i => when(col(s"t_${i + 1}").isNotNull, 1L)
        .otherwise(0L)).reduce(_ + _))
  }

  /** The funnel scoreboard: one row per step with the users reaching it,
    * conversion from the funnel head, and conversion from the previous
    * step — single divisions over exact counts (null at the head / on an
    * empty funnel, never a division blowup). Built from ONE aggregation
    * over [[funnelPerUser]]'s bounded output. */
  def funnelReport(perUser: DataFrame, steps: Seq[String]): DataFrame = {
    val g = perUser.agg(
      count(lit(1)).as("__n"),
      steps.indices.map(i =>
        sum(when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L))
          .as(s"__r_${i + 1}")): _*)
    steps.zipWithIndex.map { case (step, i) =>
      val n = col(s"__r_${i + 1}")
      val head = col("__r_1")
      val prev = if (i == 0) lit(null) else col(s"__r_$i")
      g.select(
        lit(i + 1).as("step"), lit(step).as("event_type"),
        n.as("n_users"),
        when(head > 0, n.cast("double") / head.cast("double"))
          .as("conversion_from_head"),
        when(prev.isNotNull && prev > 0, n.cast("double") / prev.cast("double"))
          .as("conversion_from_prev"))
    }.reduce(_ unionByName _)
  }

  /** Weekly retention-cohort matrix — the classic product-analytics
    * triangle. A user's cohort is the Monday-truncated week of their FIRST
    * event matching `cohortWhen`; they count as retained at `week_age` k if
    * any event matching `activeWhen` falls in cohort_week + k weeks.
    * Output: (cohort_week, week_age, n_active, cohort_size, retention),
    * with age 0 = the cohort week itself; pre-cohort activity is dropped.
    *
    * Scale shape: one partial-agg for cohorts (min per user), one distinct
    * on (user, week) for activity — both shuffles on the user key — then a
    * cells-sized matrix agg. Distinct-before-join keeps the join input
    * |users × weeks|-bounded, not event-bounded. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       cohortWhen: Column, activeWhen: Column): DataFrame = {
    val week = trunc(to_date(col(tsCol)), "week")
    val cohorts = events.filter(cohortWhen)
      .groupBy(col(userCol)).agg(min(week).as("__cw"))
    val active = events.filter(activeWhen)
      .select(col(userCol), week.as("__aw")).distinct()
    val sizes = cohorts.groupBy(col("__cw").as("cohort_week"))
      .agg(count(lit(1)).cast("long").as("cohort_size"))
    val mat = active.join(cohorts, Seq(userCol))
      .withColumn("week_age",
        (datediff(col("__aw"), col("__cw")) / 7).cast("int"))
      .filter(col("week_age") >= 0)
      .groupBy(col("__cw").as("cohort_week"), col("week_age"))
      .agg(count(lit(1)).cast("long").as("n_active"))
    mat.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_age"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size").cast("double"))
          .as("retention"))
  }
}
