package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.ops.Mutations

/** Randomized differential for the mutation operators: random op sequences
  * applied through the DataFrame transforms must equal a driver-side map
  * state machine porting the reference semantics (collection/mutations.rs,
  * ttl.rs, accessors.rs). The DataFrame wiring (left_anti + union upserts,
  * left-join + coalesce metadata updates, predicate tombstones) is where
  * join/null subtleties hide; the JSON merge-patch itself is shared code,
  * oracle-gated separately.
  */
object MutationsDifferentialSpec {
  // top-level so Spark can derive an Encoder
  final case class Row0(id: Long, metadata: String, ttl_expires_at: Option[Long],
                        deleted: Boolean)
}

class MutationsDifferentialSpec extends SparkSpec {
  import spark.implicits._
  import MutationsDifferentialSpec.Row0

  private sealed trait Op
  private case class Upsert(rows: Seq[Row0]) extends Op
  private case class UpdateMeta(changes: Seq[(Long, String)]) extends Op
  private case class Patch(patches: Seq[(Long, String)]) extends Op
  private case class Tombstone(ids: Set[Long]) extends Op
  private case class Expire(now: Long) extends Op
  private case class Compact(now: Long) extends Op

  private def meta(rnd: scala.util.Random): String = {
    val k = "k" + rnd.nextInt(3)
    if (rnd.nextInt(4) == 0) s"""{"$k":null}"""
    else s"""{"$k":"v${rnd.nextInt(5)}","n":${rnd.nextInt(9)}}"""
  }

  private def randomOps(seed: Int, n: Int): Seq[Op] = {
    val rnd = new scala.util.Random(seed)
    def ids(k: Int) = Seq.fill(k)(rnd.nextInt(25).toLong).distinct
    (0 until n).map { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => Upsert(ids(1 + rnd.nextInt(4)).map(i =>
          Row0(i, meta(rnd),
            if (rnd.nextInt(3) == 0) Some(100L + rnd.nextInt(50)) else None,
            deleted = false)))
        case 4 => UpdateMeta(ids(1 + rnd.nextInt(3)).map(_ -> meta(rnd)))
        case 5 | 6 => Patch(ids(1 + rnd.nextInt(3)).map(_ -> meta(rnd)))
        case 7 => Tombstone(ids(1 + rnd.nextInt(3)).toSet)
        case 8 => Expire(100L + rnd.nextInt(60))
        case 9 => Compact(100L + rnd.nextInt(60))
      }
    }
  }

  /** Reference state machine over a mutable map. */
  private def model(ops: Seq[Op]): Map[Long, Row0] = {
    val st = mutable.LinkedHashMap[Long, Row0]()
    ops.foreach {
      case Upsert(rows)    => rows.foreach(r => st(r.id) = r)
      case UpdateMeta(chs) => chs.foreach { case (i, m) =>
        st.get(i).foreach(r => st(i) = r.copy(metadata = m)) }
      case Patch(ps)       => ps.foreach { case (i, p) =>
        st.get(i).foreach(r =>
          st(i) = r.copy(metadata = Mutations.mergePatchJson(r.metadata, p))) }
      case Tombstone(ids)  => ids.foreach(i =>
        st.get(i).foreach(r => st(i) = r.copy(deleted = true)))
      case Expire(now)     =>
        st.filterInPlace((_, r) => r.ttl_expires_at.forall(_ > now))
      case Compact(now)    =>
        st.filterInPlace((_, r) => r.ttl_expires_at.forall(_ > now) && !r.deleted)
    }
    st.toMap
  }

  for (seed <- Seq(5, 6))
    test(s"mutation transforms == reference state machine (seed $seed, 40 ops)") {
      val ops = randomOps(seed, 40)
      var df = Seq.empty[Row0].toDS.toDF
      ops.foreach {
        case Upsert(rows)    => df = Mutations.upsert(df, rows.toDS.toDF)
        case UpdateMeta(chs) => df = Mutations.updateMetadata(df,
          chs.toDF("id", "metadata"))
        case Patch(ps)       => df = Mutations.mergePatch(df,
          ps.toDF("id", "metadata"))
        case Tombstone(ids)  => df = Mutations.tombstone(df,
          col("id").isin(ids.toSeq: _*))
        case Expire(now)     => df = Mutations.expireVectors(df, now)
        case Compact(now)    => df = Mutations.compact(df, now)
      }
      // cut the 40-op lineage once at the end (correctness, not perf)
      val got = df.select("id", "metadata", "ttl_expires_at", "deleted")
        .collect()
        .map(r => r.getLong(0) -> Row0(r.getLong(0), r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3)))
        .toMap
      val want = model(ops)
      assert(got.keySet == want.keySet,
        s"ids differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      for ((id, w) <- want)
        assert(got(id) == w, s"id $id: got ${got(id)} want $w")
    }
}
