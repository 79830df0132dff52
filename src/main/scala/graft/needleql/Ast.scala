package graft.needleql

/** NeedleQL AST (SURVEY.md §2.9; reference: src/search/query_lang/ast.rs
  * for the embedded layer, src/search/needleql_executor.rs:61-232 for the
  * service-layer statements and SELECT extensions).
  */
object Ast {

  // ------------------------------------------------------------- statements
  sealed trait Statement
  final case class SelectStmt(q: Query) extends Statement
  final case class ExplainStmt(q: Query, analyze: Boolean) extends Statement
  final case class InsertStmt(collection: String, id: String,
                              vector: Seq[Float],
                              metadataJson: Option[String]) extends Statement
  final case class DeleteStmt(collection: String,
                              where: Option[Expression]) extends Statement
  final case class CreateCollectionStmt(name: String,
                                        options: Map[String, String]) extends Statement
  final case class DropCollectionStmt(name: String) extends Statement
  case object ShowCollectionsStmt extends Statement
  final case class CreateViewStmt(name: String, materialized: Boolean,
                                  query: Query) extends Statement
  final case class DropViewStmt(name: String) extends Statement

  // ------------------------------------------------------------------ query
  final case class Query(
      explain: Boolean = false,
      analyze: Boolean = false,
      select: SelectClause = SelectAll,
      from: String = "",
      nearestTo: Option[NearestTo] = None,
      asOf: Option[AsOf] = None,
      timeDecay: Option[TimeDecayClause] = None,
      rag: Option[RagOptions] = None,
      hybrid: Option[HybridSearch] = None,
      where: Option[Expression] = None,
      rerank: Option[RerankClause] = None,
      orderBy: Seq[(String, Boolean)] = Nil, // (column, ascending)
      limit: Option[Long] = None,
      offset: Option[Long] = None)

  sealed trait SelectClause
  case object SelectAll extends SelectClause
  final case class SelectCols(cols: Seq[String]) extends SelectClause

  /** AS OF [TIMESTAMP] ts | VERSION n | SNAPSHOT 'name' | '<time expr>'
    * (reference: needleql_executor.rs:905-975, AsOfClause :124-134).
    */
  sealed trait AsOf
  final case class AsOfTimestamp(ts: Long) extends AsOf
  final case class AsOfVersion(version: Long) extends AsOf
  final case class AsOfSnapshot(name: String) extends AsOf
  final case class AsOfExpr(expr: String) extends AsOf

  /** FROM coll NEAREST_TO([v...] [, 'metric'] [, ef_search]) */
  final case class NearestTo(vector: Seq[Float], distanceFn: Option[String],
                             efSearch: Option[Int])

  /** HYBRID_SEARCH('text', [v...] [, vector_weight [, rrf_k]]) */
  final case class HybridSearch(text: String, vector: Option[Seq[Float]],
                                vectorWeight: Double = 0.5, rrfK: Double = 60.0)

  /** WITH TIME_DECAY(fn, k=v, ...) — fns linear/exponential/gaussian/step
    * (reference: ast.rs:64-70).
    */
  final case class TimeDecayClause(function: String, params: Map[String, Double])

  /** USING RAG(top_k=.., rerank=.., hybrid_alpha=.., deduplicate=..) */
  final case class RagOptions(topK: Option[Int], rerank: Option[Boolean],
                              hybridAlpha: Option[Double],
                              deduplicate: Option[Boolean])

  final case class RerankClause(strategy: RerankStrategy, fetchK: Option[Int])
  sealed trait RerankStrategy
  object RerankStrategy {
    final case class Field(column: String, ascending: Boolean) extends RerankStrategy
    final case class Mmr(lambda: Double) extends RerankStrategy
    final case class CrossEncoder(model: String) extends RerankStrategy
    final case class Rrf(k: Int) extends RerankStrategy
  }

  // ------------------------------------------------------------ expressions
  sealed trait Expression
  final case class Comparison(column: String, op: String, value: Literal) extends Expression
  final case class SimilarTo(column: String, queryParam: String) extends Expression
  final case class InList(column: String, values: Seq[Literal], negated: Boolean) extends Expression
  final case class BetweenExpr(column: String, low: Literal, high: Literal,
                               negated: Boolean) extends Expression
  final case class LikeExpr(column: String, pattern: String, negated: Boolean) extends Expression
  final case class IsNullExpr(column: String, negated: Boolean) extends Expression
  final case class AndExpr(l: Expression, r: Expression) extends Expression
  final case class OrExpr(l: Expression, r: Expression) extends Expression
  final case class NotExpr(e: Expression) extends Expression

  sealed trait Literal
  final case class StrLit(s: String) extends Literal
  final case class NumLit(d: Double) extends Literal
  final case class BoolLit(b: Boolean) extends Literal
  case object NullLit extends Literal
  final case class ParamRef(name: String) extends Literal
  final case class DurationLit(seconds: Long) extends Literal
}
