package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Conflated change-delta stream (R6): per key, per micro-batch, emit at
  * most ONE delta — and only when the key's state genuinely changed.
  *
  * The reference throttles commits by conflating queued events per
  * partition before applying (reference: CDCStreamPipeline.scala:99
  * micro-batch window; coordinator commit cadence
  * DefaultOffsetCoordinator.scala:117-150). Spark-first this is keyed
  * state: `flatMapGroupsWithState` folds each batch's events onto the
  * last applied (pos, op, value) per key — LWW by pos, replayed
  * positions ignored — and emits a delta only when the fold lands on a
  * different value than it started from. Ten updates to one key in a
  * batch produce one delta; an update writing the value already present
  * produces none (the throttle), and a replayed batch produces none
  * (idempotence, the effectively-once contract README.md:524-552).
  *
  * State is one small record per live key, the same cardinality as the
  * downstream table itself; production deployments bound it with the
  * state-store TTL or a timeout matching their retention.
  */
object Conflation {

  final case class ChangeIn(tbl: String, pk: Long, op: String, pos: Long, value: Double)
  final case class KeyState(pos: Long, op: String, value: Double)
  final case class Delta(tbl: String, pk: Long, op: String, pos: Long,
                         value: Option[Double], prev_value: Option[Double])

  def conflatedDeltas(changes: Dataset[ChangeIn]): Dataset[Delta] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(c => (c.tbl, c.pk))
      .flatMapGroupsWithState[KeyState, Delta](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (String, Long), rows: Iterator[ChangeIn], state: GroupState[KeyState]) =>
          val before = state.getOption
          // fold in pos order; drop already-applied positions (replay)
          val after = rows.toSeq.sortBy(_.pos)
            .filter(e => before.forall(_.pos < e.pos))
            .foldLeft(before) { (cur, e) =>
              if (cur.exists(_.pos >= e.pos)) cur
              else Some(KeyState(e.pos, e.op, e.value))
            }
          after match {
            case None => Iterator.empty
            case Some(s) =>
              state.update(s)
              val wasLive = before.exists(_.op != "D")
              val isLive = s.op != "D"
              (wasLive, isLive) match {
                case (true, false) =>
                  Iterator.single(Delta(key._1, key._2, "D", s.pos, None, before.map(_.value)))
                case (false, true) =>
                  Iterator.single(Delta(key._1, key._2, "I", s.pos, Some(s.value), None))
                case (true, true) if before.exists(_.value != s.value) =>
                  Iterator.single(Delta(key._1, key._2, "U", s.pos, Some(s.value), before.map(_.value)))
                case _ => Iterator.empty // no-op write or dead→dead: throttled
              }
          }
      }
  }
}
