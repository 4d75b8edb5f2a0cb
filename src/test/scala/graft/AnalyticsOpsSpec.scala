package graft

import graft.ops.Analytics
import org.apache.spark.sql.DataFrame

/** Ordered-funnel and cohort-retention semantics on hand-built event
  * logs: the funnel is sequence-sensitive (stage k counts only users who
  * did stage k AFTER completing stage k-1), retention cells are keyed by
  * Monday-truncated cohort week and exact week offsets.
  */
class AnalyticsOpsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events(rows: (Long, String, String)*): DataFrame =
    rows.zipWithIndex.map { case ((u, t, tp), i) => (i.toLong, ts(t), u, tp) }
      .toDF("event_id", "ts", "user_id", "event_type")

  test("funnel: stages count only in-order completions") {
    val ev = events(
      // user 1: view -> click -> purchase, fully in order
      (1L, "2026-01-05 10:00:00", "view"),
      (1L, "2026-01-05 11:00:00", "click"),
      (1L, "2026-01-05 12:00:00", "purchase"),
      // user 2: clicked BEFORE first view; purchase without an in-order click
      (2L, "2026-01-05 09:00:00", "click"),
      (2L, "2026-01-05 10:00:00", "view"),
      (2L, "2026-01-05 11:00:00", "purchase"),
      // user 3: view only
      (3L, "2026-01-05 10:00:00", "view"))
    val got = Analytics.funnel(ev, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("view", 1L, 3L), ("click", 2L, 1L), ("purchase", 3L, 1L)))
  }

  test("funnel: ties on the completion timestamp do not count (strictly after)") {
    val ev = events(
      (1L, "2026-01-05 10:00:00", "view"),
      (1L, "2026-01-05 10:00:00", "click"))
    val got = Analytics.funnel(ev, Seq("view", "click"))
      .collect().map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(got == Seq(("view", 1L), ("click", 0L)))
  }

  test("retention: cohort week is the Monday of the first event; offsets are exact weeks") {
    // 2026-01-05 is a Monday
    val ev = events(
      (1L, "2026-01-06 10:00:00", "view"),  // u1 cohort week 2026-01-05
      (1L, "2026-01-20 10:00:00", "view"),  // u1 active again in week 2
      (2L, "2026-01-07 10:00:00", "view"))  // u2 same cohort, week 0 only
    val got = Analytics.retention(ev)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("2026-01-05", 0L, 2L), ("2026-01-05", 2L, 1L)))
  }
}
