package graft.kg

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def node(name: String) = (Ids.entity("default", name), name)

  test("alias spellings pair via the normalized key; distinct ids do not") {
    val nodes = Seq(
      node("Customer#000000042"),
      node("Customer#42"),
      node("Customer#000000043"), // near in char space, distinct entity
      node("NATION_3"),
    ).toDF("uuid", "name")
    val pairs = Linking
      .duplicatePairs(nodes)
      .collect()
      .map(r => Set(r.getString(0), r.getString(1)))
      .toSet
    val want = Set(Set(Ids.entity("default", "Customer#000000042"), Ids.entity("default", "Customer#42")))
    assert(pairs == want)
  }

  test("multi-word names pair via token-Jaccard LSH") {
    val nodes = Seq(
      node("Acme Global Holdings Inc"),
      node("Acme Global Holdings"),   // 3/4 tokens shared = 0.75 < 0.8 → NOT dup
      node("acme global holdings inc"), // case variant → jaccard 1.0 → dup
      node("Bravo Systems"),
    ).toDF("uuid", "name")
    val pairs = Linking
      .duplicatePairs(nodes)
      .collect()
      .map(r => Set(r.getString(0), r.getString(1)))
      .toSet
    assert(
      pairs == Set(
        Set(Ids.entity("default", "Acme Global Holdings Inc"), Ids.entity("default", "acme global holdings inc")),
      ),
    )
  }

  test("canonicalMap: min uuid per component; remap coalesces unmapped") {
    val pairs = Seq(("b", "c"), ("c", "d"), ("x", "y")).toDF("u1", "u2")
    val m = Linking.canonicalMap(pairs).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("b" -> "b", "c" -> "b", "d" -> "b", "x" -> "x", "y" -> "x"))
    val edges = Seq(("c", "y", "r"), ("z", "d", "r")).toDF("source_uuid", "target_uuid", "name")
    val remapped = Linking
      .remapPointers(edges, Linking.canonicalMap(pairs).toDF("uuid", "canonical"))
      .select("source_uuid", "target_uuid")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    assert(remapped == Set(("b", "x"), ("z", "b")))
  }

  test("normName strips padding, case, separators") {
    val got = Seq("Customer#000000042", "customer #42", "CUSTOMER-42", "Customer#420")
      .toDF("n")
      .select(Linking.normName(col("n")))
      .as[String]
      .collect()
      .toSeq
    assert(got == Seq("customer42", "customer42", "customer42", "customer420"))
  }
}
