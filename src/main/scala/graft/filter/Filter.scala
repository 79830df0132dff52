package graft.filter

/** The metadata filter language (SURVEY.md §2.2; reference:
  * src/metadata.rs:643-730): 18 condition operators + And/Or/Not, parsed
  * from MongoDB-style JSON (reference parser: src/metadata.rs:984-1193).
  */
sealed trait FilterOp
object FilterOp {
  case object Eq extends FilterOp
  case object Ne extends FilterOp
  case object Gt extends FilterOp
  case object Gte extends FilterOp
  case object Lt extends FilterOp
  case object Lte extends FilterOp
  case object In extends FilterOp
  case object NotIn extends FilterOp
  case object Contains extends FilterOp
  case object StartsWith extends FilterOp
  case object EndsWith extends FilterOp
  case object Exists extends FilterOp
  case object Regex extends FilterOp
  case object All extends FilterOp
  case object ElemMatch extends FilterOp
  case object Between extends FilterOp
  case object Size extends FilterOp
  case object Type extends FilterOp

  /** `$op` spellings (reference: src/metadata.rs:1095-1190). */
  def parse(s: String): FilterOp = s match {
    case "$eq"         => Eq
    case "$ne"         => Ne
    case "$gt"         => Gt
    case "$gte"        => Gte
    case "$lt"         => Lt
    case "$lte"        => Lte
    case "$in"         => In
    case "$nin"        => NotIn
    case "$contains"   => Contains
    case "$startsWith" => StartsWith
    case "$endsWith"   => EndsWith
    case "$exists"     => Exists
    case "$regex"      => Regex
    case "$all"        => All
    case "$elemMatch"  => ElemMatch
    case "$between"    => Between
    case "$size"       => Size
    case "$type"       => Type
    case other => throw new IllegalArgumentException(s"Unknown operator: $other")
  }
}

sealed trait Filter {
  def and(other: Filter): Filter = Filter.And(Seq(this, other))
  def or(other: Filter): Filter = Filter.Or(Seq(this, other))
  def unary_! : Filter = Filter.Not(this)
}

object Filter {
  /** Nesting/size limits of the reference parser (src/metadata.rs:971-974). */
  val MaxDepth = 32
  val MaxArraySize = 1000

  final case class Condition(field: String, op: FilterOp, value: JValue) extends Filter
  final case class And(filters: Seq[Filter]) extends Filter
  final case class Or(filters: Seq[Filter]) extends Filter
  final case class Not(filter: Filter) extends Filter

  def eq(field: String, v: JValue): Filter = Condition(field, FilterOp.Eq, v)

  /** Parse a MongoDB-style JSON filter string. */
  def parse(json: String): Filter = parse(JValue.parse(json))

  /** Parse a MongoDB-style JSON filter value (reference:
    * src/metadata.rs:984-1193): `{"$and": [...]}`, `{"$or": [...]}`,
    * `{"$not": {...}}`, `{"field": {"$op": v, ...}}`, or the bare
    * `{"field": v}` = Eq shorthand (src/metadata.rs:1191).
    */
  def parse(v: JValue): Filter = parseWithDepth(v, 0)

  private def parseWithDepth(v: JValue, depth: Int): Filter = {
    if (depth > MaxDepth)
      throw new IllegalArgumentException(s"Filter nesting too deep (max $MaxDepth levels)")
    v match {
      case JObj(fields) =>
        val m = fields.toMap
        m.get("$and").map(a => And(parseArray(a, "$and", depth + 1)))
          .orElse(m.get("$or").map(a => Or(parseArray(a, "$or", depth + 1))))
          .orElse(m.get("$not").map(n => Not(parseWithDepth(n, depth + 1))))
          .getOrElse {
            val conds = fields.map {
              case (f, _) if f.startsWith("$") =>
                throw new IllegalArgumentException(s"Unknown operator: $f")
              case (f, fv) => parseFieldCondition(f, fv)
            }
            conds match {
              case Vector()  => throw new IllegalArgumentException("Empty filter object")
              case Vector(c) => c
              case cs        => And(cs)
            }
          }
      case _ => throw new IllegalArgumentException("Filter must be a JSON object")
    }
  }

  private def parseArray(v: JValue, op: String, depth: Int): Seq[Filter] = v match {
    case JArr(vs) =>
      if (vs.length > MaxArraySize)
        throw new IllegalArgumentException(
          s"$op array too large (${vs.length} elements, max $MaxArraySize)")
      vs.map(parseWithDepth(_, depth))
    case _ => throw new IllegalArgumentException(s"$op must be an array")
  }

  /** `{"field": {"$op": v, ...}}` -> conditions; `{"field": v}` -> Eq. An
    * object value whose keys do not all start with `$` is an Eq on the
    * object itself.
    */
  private def parseFieldCondition(field: String, v: JValue): Filter = v match {
    case JObj(ops) if ops.nonEmpty && ops.forall(_._1.startsWith("$")) =>
      val conds = ops.map { case (op, opv) =>
        // the array cap applies to VALUE arrays ($in/$nin/$all…) too,
        // not just $and/$or operand lists — an unbounded $in would
        // otherwise build an arbitrarily large isin from hostile input
        opv match {
          case JArr(vs) if vs.length > MaxArraySize =>
            throw new IllegalArgumentException(
              s"$op array too large (${vs.length} elements, max $MaxArraySize)")
          case _ => ()
        }
        Condition(field, FilterOp.parse(op), opv): Filter
      }
      if (conds.length == 1) conds.head else And(conds)
    case other => Condition(field, FilterOp.Eq, other)
  }
}
