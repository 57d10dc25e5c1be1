package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Composable date-filter DSL — the reference's `SearchFilters` CNF
  * lists-of-lists (`graphiti_core/search/search_filters.py:26-123`):
  * the outer list is AND-ed, each inner list OR-ed; operators
  * `= <> > < >= <= IS NULL / IS NOT NULL` over the four bitemporal
  * columns. Produces one Catalyst `Column` predicate tree — pushed down
  * by Catalyst like any hand-written filter.
  */
object SearchFilters {

  sealed trait Op
  case object Eq extends Op
  case object Ne extends Op
  case object Gt extends Op
  case object Lt extends Op
  case object Gte extends Op
  case object Lte extends Op
  case object IsNull extends Op
  case object IsNotNull extends Op

  /** One comparison: column op value (value ignored for null checks). */
  final case class DateFilter(column: String, op: Op, value: Option[java.sql.Timestamp] = None)

  /** CNF: AND of ORs (search_filters.py:87-123). */
  final case class Filters(
      validAt: Seq[Seq[DateFilter]] = Nil,
      invalidAt: Seq[Seq[DateFilter]] = Nil,
      createdAt: Seq[Seq[DateFilter]] = Nil,
      expiredAt: Seq[Seq[DateFilter]] = Nil,
      edgeTypes: Seq[String] = Nil,
      nodeLabels: Seq[String] = Nil,
  )

  private def one(f: DateFilter): Column = {
    val c = col(f.column)
    f.op match {
      case Eq => c === lit(f.value.get)
      case Ne => c =!= lit(f.value.get)
      case Gt => c > lit(f.value.get)
      case Lt => c < lit(f.value.get)
      case Gte => c >= lit(f.value.get)
      case Lte => c <= lit(f.value.get)
      case IsNull => c.isNull
      case IsNotNull => c.isNotNull
    }
  }

  private def cnf(groups: Seq[Seq[DateFilter]]): Option[Column] =
    if (groups.isEmpty) None
    else Some(groups.map(g => g.map(one).reduce(_ || _)).reduce(_ && _))

  /** Build the full predicate (true when no filters configured). */
  def toPredicate(f: Filters): Column = {
    val parts =
      Seq(cnf(f.validAt), cnf(f.invalidAt), cnf(f.createdAt), cnf(f.expiredAt)).flatten ++
        (if (f.edgeTypes.nonEmpty) Seq(col("name").isin(f.edgeTypes: _*)) else Nil) ++
        (if (f.nodeLabels.nonEmpty)
           Seq(arrays_overlap(col("labels"), array(f.nodeLabels.map(lit): _*)))
         else Nil)
    parts.reduceOption(_ && _).getOrElse(lit(true))
  }

  /** Schema-aware variant: one Filters object scopes ALL lanes (the
    * reference keeps node_labels and edge_types side by side in one
    * SearchFilters, search_filters.py:26-123, and each table applies the
    * parts that exist for it) — a part referencing a column the frame
    * lacks is skipped instead of raising UNRESOLVED_COLUMN:
    *  - `nodeLabels` applies only to label-bearing frames;
    *  - `edgeTypes` only to true edge frames (endpoint columns present —
    *    `name` alone is ambiguous: node names are entity surface text);
    *  - a date-filter OR-group is skipped when any member's column is
    *    absent (the frame has no such temporal dimension; dropping the
    *    whole group is the conservative direction — dropping only the
    *    absent disjuncts would strengthen the OR).
    */
  def toPredicate(f: Filters, columns: Seq[String]): Column = {
    val have = columns.toSet
    def present(groups: Seq[Seq[DateFilter]]) = groups.filter(_.forall(d => have(d.column)))
    val isEdgeFrame = have("source_uuid") && have("target_uuid")
    val parts =
      Seq(cnf(present(f.validAt)), cnf(present(f.invalidAt)), cnf(present(f.createdAt)), cnf(present(f.expiredAt))).flatten ++
        (if (f.edgeTypes.nonEmpty && isEdgeFrame && have("name")) Seq(col("name").isin(f.edgeTypes: _*)) else Nil) ++
        (if (f.nodeLabels.nonEmpty && have("labels"))
           Seq(arrays_overlap(col("labels"), array(f.nodeLabels.map(lit): _*)))
         else Nil)
    parts.reduceOption(_ && _).getOrElse(lit(true))
  }
}
