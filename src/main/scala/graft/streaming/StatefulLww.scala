package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LWW-register convergence with explicit keyed state — the
  * change-stream form of `ops.Crdt.converge` (reference:
  * src/experimental/crdt.rs LWW registers; src/experimental/streaming_
  * upsert.rs applies the same arbitration on its consumer side).
  *
  * Spark-first note on WHY this is the one stateful-API operator:
  * exactly-once ingest is `dropDuplicatesWithinWatermark` (declarative,
  * already used by `Streams.streamingDedup`), but out-of-order LWW
  * arbitration is max-HLC-RANK-per-key — a running argmax that must
  * observe every arrival and emit only on takeover. That is keyed
  * custom state, i.e. `KeyValueGroupedDataset.flatMapGroupsWithState`:
  * per id the state is ONE small register (hlc + payload), bounded by
  * key cardinality, not stream length.
  *
  * Emission contract (what a change-feed consumer wants): at most one
  * [[StatefulLww.Change]] per key per micro-batch — the post-batch
  * converged register, emitted only when the batch actually changed it.
  * Late out-ranked arrivals and redeliveries of the winning op emit
  * NOTHING (idempotent effect on state), which makes the output safe to
  * apply downstream without its own dedup pass.
  *
  * Rank is the batch engine's HLC tuple: (physical, logical, replica),
  * lexicographic (ops/Crdt.scala `hlc`). In batch mode the same code
  * converges a whole op-log in one pass; `CrdtDifferentialSpec`-style
  * parity with `Crdt.converge` over add/delete logs is spec-asserted.
  */
object StatefulLww {

  final case class Op(id: String, physical: Long, logical: Long,
                      replica: String, op: String, payload: String)

  final case class RegState(physical: Long, logical: Long, replica: String,
                            op: String, payload: String)

  final case class Change(id: String, physical: Long, logical: Long,
                          replica: String, alive: Boolean, payload: String)

  private val rankOrd = Ordering.Tuple3[Long, Long, String]

  private def arbitrate(id: String, batch: Iterator[Op],
                        state: GroupState[RegState]): Iterator[Change] = {
    var cur = state.getOption
    var changed = false
    batch.foreach { o =>
      val wins = cur.forall(s => rankOrd.gt(
        (o.physical, o.logical, o.replica),
        (s.physical, s.logical, s.replica)))
      if (wins) {
        cur = Some(RegState(o.physical, o.logical, o.replica, o.op, o.payload))
        changed = true
      }
    }
    cur match {
      case Some(s) if changed =>
        state.update(s)
        Iterator.single(Change(id, s.physical, s.logical, s.replica,
          alive = s.op != "delete", s.payload))
      case _ => Iterator.empty
    }
  }

  /** Converged change stream of an op stream (streaming or batch). */
  def changes(ops: Dataset[Op]): Dataset[Change] = {
    import ops.sparkSession.implicits._
    ops.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(arbitrate)
  }
}
