package graft

import org.apache.spark.sql.functions._

import graft.filter._

/** Randomized differential for the filter language: the compiled Catalyst
  * predicate must agree row-for-row with a direct port of the reference
  * evaluator (metadata.rs:931-1416 evaluate_condition/compare_values) on
  * random documents and random filter trees. Regex/$elemMatch/$type are
  * exercised by FilterCompilerSpec's pointwise cases; this spec sweeps the
  * other 15 operators with And/Or/Not composition, including deliberately
  * type-mismatched conditions (numeric op on a string field, $in with a
  * non-array literal) whose false/true fallbacks are easy to get wrong.
  */
object FilterDifferentialSpec {
  // top-level so Spark can derive Encoders (inner classes need outer scope)
  final case class NX(x: Option[Double])
  final case class Doc(id: Int, a: Option[Double], b: Option[Double],
                       s: Option[String], arr: Option[Seq[String]],
                       n: Option[NX])
}

class FilterDifferentialSpec extends SparkSpec {
  import spark.implicits._
  import FilterDifferentialSpec.{Doc, NX}

  // ------------------------------------------------- reference evaluator

  private def getField(v: JValue, path: String): Option[JValue] =
    path.split('.').foldLeft(Option(v)) {
      case (Some(JObj(fs)), p)  => fs.find(_._1 == p).map(_._2)
      case (Some(JArr(vs)), p)  => p.toIntOption.flatMap(i => vs.lift(i))
      case _                    => None
    }

  private def num(v: JValue): Option[Double] =
    v match { case JNum(d) => Some(d); case _ => None }

  private def cmpNum(a: JValue, b: JValue, f: (Double, Double) => Boolean) =
    (num(a), num(b)) match { case (Some(x), Some(y)) => f(x, y); case _ => false }

  private def refMatches(f: Filter, doc: JValue): Boolean = f match {
    case Filter.And(fs) => fs.forall(refMatches(_, doc))
    case Filter.Or(fs)  => fs.exists(refMatches(_, doc))
    case Filter.Not(g)  => !refMatches(g, doc)
    case Filter.Condition(field, op, value) =>
      if (op == FilterOp.Exists) {
        val want = value match { case JBool(b) => b; case _ => true }
        getField(doc, field).isDefined == want
      } else getField(doc, field) match {
        case None     => false
        case Some(fv) => op match {
          case FilterOp.Eq  => fv == value
          case FilterOp.Ne  => fv != value
          case FilterOp.Gt  => cmpNum(fv, value, _ > _)
          case FilterOp.Gte => cmpNum(fv, value, _ >= _)
          case FilterOp.Lt  => cmpNum(fv, value, _ < _)
          case FilterOp.Lte => cmpNum(fv, value, _ <= _)
          case FilterOp.In =>
            value match { case JArr(vs) => vs.contains(fv); case _ => false }
          case FilterOp.NotIn =>
            value match { case JArr(vs) => !vs.contains(fv); case _ => true }
          case FilterOp.Contains => (fv, value) match {
            case (JStr(h), JStr(nd)) => h.contains(nd)
            case (JArr(vs), v)       => vs.contains(v)
            case _                   => false
          }
          case FilterOp.StartsWith => (fv, value) match {
            case (JStr(h), JStr(p)) => h.startsWith(p); case _ => false
          }
          case FilterOp.EndsWith => (fv, value) match {
            case (JStr(h), JStr(p)) => h.endsWith(p); case _ => false
          }
          case FilterOp.All => (fv, value) match {
            case (JArr(fa), JArr(req)) => req.forall(fa.contains)
            case _                     => false
          }
          case FilterOp.Between => value match {
            case JArr(Vector(lo, hi)) =>
              cmpNum(fv, lo, _ >= _) && cmpNum(fv, hi, _ <= _)
            case _ => false
          }
          case FilterOp.Size => (fv, num(value)) match {
            case (JArr(vs), Some(k)) => vs.length == k
            case (JStr(st), Some(k)) => st.length == k
            case _                   => false
          }
          case other => sys.error(s"generator produced unexpected op $other")
        }
      }
  }

  // ------------------------------------------------------------- fixtures

  private val strings = Vector("ab", "abc", "xyz", "a", "xab")
  private val tagPool = Vector("t1", "t2", "t3")

  private def randomDocs(seed: Int, n: Int): Seq[Doc] = {
    val rnd = new scala.util.Random(seed)
    def opt[T](v: => T): Option[T] = if (rnd.nextInt(5) == 0) None else Some(v)
    (0 until n).map { i =>
      Doc(i, opt(rnd.nextInt(6) * 0.5), opt(rnd.nextInt(4).toDouble),
        opt(strings(rnd.nextInt(strings.length))),
        opt(Seq.fill(rnd.nextInt(4))(tagPool(rnd.nextInt(tagPool.length))).distinct),
        opt(NX(opt(rnd.nextInt(5).toDouble))))
    }
  }

  private def toJ(d: Doc): JValue = {
    val fs = Vector.newBuilder[(String, JValue)]
    d.a.foreach(v => fs += "a" -> JNum(v))
    d.b.foreach(v => fs += "b" -> JNum(v))
    d.s.foreach(v => fs += "s" -> JStr(v))
    d.arr.foreach(v => fs += "arr" -> JArr(v.map(JStr).toVector))
    d.n.foreach { nx =>
      fs += "n" -> JObj(nx.x.map(v => Vector("x" -> JNum(v)))
        .getOrElse(Vector.empty))
    }
    JObj(fs.result())
  }

  private def randomFilter(rnd: scala.util.Random, depth: Int): Filter = {
    def jnum() = JNum(rnd.nextInt(6) * 0.5)
    def jstr() = JStr(strings(rnd.nextInt(strings.length)))
    def jtagArr() =
      JArr(Seq.fill(1 + rnd.nextInt(3))(JStr(tagPool(rnd.nextInt(3)))).toVector)
    def cond(): Filter = {
      val numericField = Vector("a", "b", "n.x")(rnd.nextInt(3))
      val mismatch = rnd.nextInt(5) == 0 // adversarial type crossing
      rnd.nextInt(11) match {
        case 0 => Filter.Condition(if (mismatch) "s" else numericField,
          Vector(FilterOp.Eq, FilterOp.Ne)(rnd.nextInt(2)), jnum())
        case 1 => Filter.Condition(if (mismatch) "s" else numericField,
          Vector(FilterOp.Gt, FilterOp.Gte, FilterOp.Lt, FilterOp.Lte)(rnd.nextInt(4)),
          if (mismatch) jstr() else jnum())
        case 2 => Filter.Condition("s",
          Vector(FilterOp.Eq, FilterOp.Ne)(rnd.nextInt(2)), jstr())
        case 3 => Filter.Condition(if (mismatch) numericField else "s",
          Vector(FilterOp.StartsWith, FilterOp.EndsWith, FilterOp.Contains)(rnd.nextInt(3)),
          jstr())
        case 4 => Filter.Condition(Vector("a", "b", "s")(rnd.nextInt(3)), FilterOp.In,
          if (mismatch) jnum()
          else JArr(Vector.fill(1 + rnd.nextInt(3))(
            if (rnd.nextBoolean()) jnum() else jstr())))
        case 5 => Filter.Condition(Vector("a", "b", "s")(rnd.nextInt(3)), FilterOp.NotIn,
          if (mismatch) jstr()
          else JArr(Vector.fill(1 + rnd.nextInt(3))(
            if (rnd.nextBoolean()) jnum() else jstr())))
        case 6 => Filter.Condition("arr", FilterOp.Contains,
          if (mismatch) jnum() else JStr(tagPool(rnd.nextInt(3))))
        case 7 => Filter.Condition("arr", FilterOp.All,
          if (mismatch) JArr(Vector(jnum(), JStr(tagPool(0)))) else jtagArr())
        case 8 => Filter.Condition(
          Vector("a", "b", "s", "arr", "n.x", "missing")(rnd.nextInt(6)),
          FilterOp.Exists, JBool(rnd.nextBoolean()))
        case 9 =>
          val lo = jnum(); val hi = jnum()
          Filter.Condition(numericField, FilterOp.Between,
            JArr(Vector(lo, hi))) // sometimes an empty range — both sides agree
        case 10 => Filter.Condition(if (mismatch) numericField
          else Vector("arr", "s")(rnd.nextInt(2)), FilterOp.Size,
          JNum(rnd.nextInt(4).toDouble))
      }
    }
    if (depth == 0 || rnd.nextInt(3) == 0) cond()
    else rnd.nextInt(3) match {
      case 0 => Filter.And(Seq.fill(1 + rnd.nextInt(2))(randomFilter(rnd, depth - 1)))
      case 1 => Filter.Or(Seq.fill(1 + rnd.nextInt(2))(randomFilter(rnd, depth - 1)))
      case 2 => Filter.Not(randomFilter(rnd, depth - 1))
    }
  }

  for (seed <- Seq(11, 22, 33))
    test(s"compiled predicate == reference evaluator (seed $seed, 80 filters x 60 docs)") {
      val docs = randomDocs(seed, 60)
      val df = docs.toDS.toDF
      val rnd = new scala.util.Random(seed * 7)
      val filters = Seq.fill(80)(randomFilter(rnd, 3))
      // all filters in ONE distributed pass: each as a boolean column
      val cols = filters.zipWithIndex.map { case (f, i) =>
        coalesce(FilterCompiler.compile(f, df), lit(false)).as(s"f$i")
      }
      val got = df.select(col("id") +: cols: _*).collect()
        .map(r => r.getInt(0) -> r).toMap
      val jdocs = docs.map(d => d.id -> toJ(d)).toMap
      for ((f, i) <- filters.zipWithIndex; d <- docs) {
        val want = refMatches(f, jdocs(d.id))
        val have = got(d.id).getBoolean(i + 1)
        assert(have == want,
          s"doc ${d.id} ${jdocs(d.id)} filter#$i $f: compiled=$have reference=$want")
      }
    }
}
