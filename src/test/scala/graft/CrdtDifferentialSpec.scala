package graft

import scala.collection.mutable

import graft.ops.Crdt

/** Differential check: [[Crdt.converge]] must equal a sequential replay of
  * the op-log through the reference's `apply_operation` state machine
  * (crdt.rs:370-437) in HLC order — the canonical delivery order every
  * replica's state converges to. Randomized over op mixes, payloads,
  * metadata writes/removes, and clock shapes (fixed seeds).
  */
class CrdtDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private case class Op(id: String, op: String, physical: Long, logical: Long,
                        replica: Long, payload: Double,
                        meta: Map[String, String], metaKey: String,
                        metaValue: String)

  /** Direct port of apply_operation: per-entry (payload, updated_at HLC,
    * deleted HLC, per-key (value, ts) metadata), ops applied in HLC order.
    */
  private def replay(ops: Seq[Op]): Map[String, (Double, (Long, Long, Long), Map[String, String])] = {
    case class Entry(var payload: Double, var updatedAt: (Long, Long, Long),
                     var deleted: Option[(Long, Long, Long)],
                     meta: mutable.Map[String, (String, (Long, Long, Long))])
    val state = mutable.Map[String, Entry]()
    implicit val ord: Ordering[(Long, Long, Long)] = Ordering.Tuple3[Long, Long, Long]
    for (o <- ops.sortBy(o => (o.physical, o.logical, o.replica))) {
      val ts = (o.physical, o.logical, o.replica)
      o.op match {
        case "add" =>
          val fresh = Entry(o.payload, ts, None,
            mutable.Map(Option(o.meta).getOrElse(Map.empty)
              .map { case (k, v) => k -> ((v, ts)) }.toSeq: _*))
          state.get(o.id) match {
            case Some(e) => if (ord.gt(ts, e.updatedAt)) state(o.id) = fresh
            case None    => state(o.id) = fresh
          }
        case "update" =>
          state.get(o.id).foreach { e =>
            if (ord.gt(ts, e.updatedAt) && e.deleted.isEmpty) {
              e.payload = o.payload; e.updatedAt = ts
            }
          }
        case "update_metadata" =>
          state.get(o.id).foreach { e =>
            if (e.deleted.isEmpty) {
              val shouldUpdate = e.meta.get(o.metaKey).forall(p => ord.gt(ts, p._2))
              if (shouldUpdate) {
                if (o.metaValue != null) e.meta(o.metaKey) = (o.metaValue, ts)
                else e.meta.remove(o.metaKey)
                e.updatedAt = ts
              }
            }
          }
        case "delete" =>
          state.get(o.id).foreach { e =>
            if (e.deleted.forall(d => ord.gt(ts, d)) && ord.gt(ts, e.updatedAt))
              e.deleted = Some(ts)
          }
      }
    }
    state.collect { case (id, e) if e.deleted.isEmpty =>
      id -> ((e.payload, e.updatedAt, e.meta.map { case (k, (v, _)) => k -> v }.toMap))
    }.toMap
  }

  private def randomLog(seed: Int, nOps: Int, nIds: Int): Seq[Op] = {
    val rnd = new scala.util.Random(seed)
    // unique HLCs: a shuffled injective clock with cross-replica physical
    // collisions (physical = clock % P) exercising logical/replica order
    val clocks = rnd.shuffle((0 until nOps).toVector)
    (0 until nOps).map { i =>
      val id = s"v${rnd.nextInt(nIds)}"
      val kind = rnd.nextInt(10) match {
        case 0 | 1        => "delete"
        case 2 | 3        => "update"
        case 4            => "update_metadata"
        case _            => "add"
      }
      val c = clocks(i)
      Op(id, kind, (c % 37).toLong, (c / 37).toLong, rnd.nextInt(3).toLong,
        math.rint(rnd.nextDouble() * 1e6) / 1e3,
        if (kind == "add" && rnd.nextBoolean())
          Map("k" + rnd.nextInt(3) -> ("v" + rnd.nextInt(5))) else Map.empty,
        if (kind == "update_metadata") "k" + rnd.nextInt(3) else null,
        if (kind == "update_metadata" && rnd.nextInt(4) == 0) null
        else "w" + rnd.nextInt(5))
    }
  }

  for (seed <- Seq(1, 2, 3))
    test(s"converge == sequential HLC-order replay (seed $seed, 600 ops / 40 ids)") {
      val ops = randomLog(seed, nOps = 600, nIds = 40)
      val df = ops.map(o => (o.id, o.op, o.physical, o.logical, o.replica,
          o.payload, if (o.meta.isEmpty) null else o.meta, o.metaKey, o.metaValue))
        .toDF("id", "op", "physical", "logical", "replica", "payload",
          "meta", "meta_key", "meta_value")
      val got = Crdt.converge(df, metaCols = true).collect().map { r =>
        r.getString(0) -> ((r.getDouble(1),
          (r.getLong(2), r.getLong(3), r.getLong(4)),
          Option(r.getMap[String, String](5))
            .map(_.toMap).getOrElse(Map.empty[String, String])))
      }.toMap
      val want = replay(ops)
      assert(got.keySet == want.keySet,
        s"alive sets differ: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
      for ((id, (p, ts, _)) <- want) {
        assert(got(id)._1 == p, s"$id payload: got ${got(id)._1} want $p")
        assert(got(id)._2 == ts, s"$id clock")
      }
      // metadata: converge scopes per-key LWW to ops out-ranking the
      // winning Add (pre-Add metadata dies with the replaced entry);
      // replay agrees because an Add installs a fresh map
      for ((id, (_, _, m)) <- want)
        assert(got(id)._3 == m, s"$id metadata: got ${got(id)._3} want $m")
    }
}
