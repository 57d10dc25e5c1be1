package graft.search

import java.sql.Timestamp

import graft.{TestSeeds, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Row shape for the filter differential (top-level: Spark encoders cannot
  * synthesize inner-class case classes).
  */
case class FilterRow(
    uuid: String,
    name: String,
    labels: Seq[String],
    valid_at: Option[Timestamp],
    invalid_at: Option[Timestamp],
    created_at: Option[Timestamp],
    expired_at: Option[Timestamp],
)

/** Seeded randomized differential for the SearchFilters CNF DSL
  * (search_filters.py:26-123) against an in-memory THREE-VALUED-LOGIC
  * evaluator: random filter trees over rows with null-heavy bitemporal
  * columns. The fixed `q_filter_dsl` oracle pins one filter; the sweep
  * covers the null-comparison semantics (NULL = x is UNKNOWN, dropped by
  * a WHERE — not false-vs-true pandas semantics) across random CNF
  * shapes, operators and edge-type/label predicates.
  */
class SearchFiltersDifferentialSpec extends AnyFunSuite {
  import SearchFilters._

  private lazy val spark = TestSpark.spark

  private val times = (0 until 5).map(i => new Timestamp(1704067200000L + i * 86400000L))
  private val names = Seq("lives_in", "works_at", "located_in")
  private val labelPool = Seq("Person", "Place", "Organization", "Entity")

  private def randomRows(rnd: scala.util.Random, n: Int): Seq[FilterRow] = {
    def t(): Option[Timestamp] = if (rnd.nextDouble() < 0.3) None else Some(times(rnd.nextInt(times.size)))
    (0 until n).map { i =>
      FilterRow(
        s"u$i",
        names(rnd.nextInt(names.size)),
        (0 until 1 + rnd.nextInt(2)).map(_ => labelPool(rnd.nextInt(labelPool.size))).distinct,
        t(), t(), t(), t(),
      )
    }
  }

  private def randomCnf(rnd: scala.util.Random, column: String): Seq[Seq[DateFilter]] =
    Seq.fill(1 + rnd.nextInt(2)) {
      Seq.fill(1 + rnd.nextInt(2)) {
        val op = Seq(Eq, Ne, Gt, Lt, Gte, Lte, IsNull, IsNotNull)(rnd.nextInt(8))
        val v = op match {
          case IsNull | IsNotNull => None
          case _ => Some(times(rnd.nextInt(times.size)))
        }
        DateFilter(column, op, v)
      }
    }

  private def randomFilters(rnd: scala.util.Random): Filters =
    Filters(
      validAt = if (rnd.nextDouble() < 0.6) randomCnf(rnd, "valid_at") else Nil,
      invalidAt = if (rnd.nextDouble() < 0.6) randomCnf(rnd, "invalid_at") else Nil,
      createdAt = if (rnd.nextDouble() < 0.4) randomCnf(rnd, "created_at") else Nil,
      expiredAt = if (rnd.nextDouble() < 0.4) randomCnf(rnd, "expired_at") else Nil,
      edgeTypes = if (rnd.nextDouble() < 0.4) rnd.shuffle(names).take(1 + rnd.nextInt(2)) else Nil,
      nodeLabels = if (rnd.nextDouble() < 0.4) rnd.shuffle(labelPool).take(1 + rnd.nextInt(2)) else Nil,
    )

  // ---- Kleene three-valued logic model (SQL WHERE semantics) ----
  private def evalOne(f: DateFilter, v: Option[Timestamp]): Option[Boolean] = f.op match {
    case IsNull => Some(v.isEmpty)
    case IsNotNull => Some(v.nonEmpty)
    case other =>
      v.map { ts =>
        val c = ts.compareTo(f.value.get)
        other match {
          case Eq => c == 0
          case Ne => c != 0
          case Gt => c > 0
          case Lt => c < 0
          case Gte => c >= 0
          case Lte => c <= 0
          case _ => throw new IllegalStateException
        }
      }
  }

  private def or3(xs: Seq[Option[Boolean]]): Option[Boolean] =
    if (xs.contains(Some(true))) Some(true)
    else if (xs.forall(_.contains(false))) Some(false)
    else None

  private def and3(xs: Seq[Option[Boolean]]): Option[Boolean] =
    if (xs.contains(Some(false))) Some(false)
    else if (xs.forall(_.contains(true))) Some(true)
    else None

  private def keeps(f: Filters, r: FilterRow): Boolean = {
    def colOf(c: String): Option[Timestamp] = c match {
      case "valid_at" => r.valid_at
      case "invalid_at" => r.invalid_at
      case "created_at" => r.created_at
      case "expired_at" => r.expired_at
    }
    def cnf(groups: Seq[Seq[DateFilter]]): Option[Option[Boolean]] =
      if (groups.isEmpty) None
      else Some(and3(groups.map(g => or3(g.map(df => evalOne(df, colOf(df.column)))))))
    val parts: Seq[Option[Boolean]] =
      Seq(cnf(f.validAt), cnf(f.invalidAt), cnf(f.createdAt), cnf(f.expiredAt)).flatten ++
        (if (f.edgeTypes.nonEmpty) Seq(Some(f.edgeTypes.contains(r.name))) else Nil) ++
        (if (f.nodeLabels.nonEmpty) Seq(Some(r.labels.exists(f.nodeLabels.contains))) else Nil)
    and3(parts).contains(true) || parts.isEmpty
  }

  test("CNF predicate == three-valued-logic model on random filters and null-heavy rows (seeded)") {
    import spark.implicits._
    for (seed <- Seq(2L, 31L, 73L).map(_ + TestSeeds.offset)) {
      val rnd = new scala.util.Random(seed)
      val rows = randomRows(rnd, 60)
      val df = rows.toDS().toDF().localCheckpoint()
      for (k <- 0 until 12) {
        val f = randomFilters(rnd)
        val got = df.filter(SearchFilters.toPredicate(f)).select("uuid").collect().map(_.getString(0)).toSet
        val expected = rows.filter(keeps(f, _)).map(_.uuid).toSet
        assert(got == expected, s"seed=$seed draw=$k: filter result diverged for $f")
      }
    }
  }
}
