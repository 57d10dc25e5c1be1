package graft.dedup

import java.sql.Timestamp

import graft.{TestSeeds, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

// Spark encoders cannot synthesize inner-class case classes — top level.
final case class TNode(
    uuid: String,
    name: String,
    group_id: String,
    labels: Seq[String],
    created_at: Timestamp,
    name_embedding: Seq[Float],
    summary: String,
    attributes: Map[String, String],
)

final case class TEdge(
    uuid: String,
    source_uuid: String,
    target_uuid: String,
    name: String,
    fact: String,
    group_id: String,
    created_at: Timestamp,
    fact_embedding: Seq[Float],
    episodes: Seq[String],
    expired_at: Option[Timestamp],
    valid_at: Option[Timestamp],
    invalid_at: Option[Timestamp],
)

class DeduplicatorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // ---------- reference-model scoring (independent plain-Scala impl) ----------

  private def toks(s: String): Seq[String] = s.toLowerCase.split("\\s+").toSeq.distinct.filter(_.nonEmpty)

  private def tokenCosine(a: String, b: String): Double = {
    val (ta, tb) = (toks(a), toks(b))
    if (ta.isEmpty || tb.isEmpty) 0.0
    else ta.intersect(tb).size.toDouble / math.sqrt(ta.size.toDouble * tb.size.toDouble)
  }

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.size) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def attrSim(a: Map[String, String], b: Map[String, String]): Double = {
    val common = a.keySet.intersect(b.keySet)
    if (common.isEmpty) 0.0
    else common.count(k => a(k) == b(k)).toDouble / common.size
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def entityScore(a: TNode, b: TNode, cfg: DeduplicationConfig): Double = {
    val emb =
      if (a.name_embedding.nonEmpty && b.name_embedding.nonEmpty) cos(a.name_embedding, b.name_embedding) else 0.0
    r6(cfg.nameWeight * tokenCosine(a.name, b.name) + cfg.embeddingWeight * emb + cfg.attributeWeight * attrSim(a.attributes, b.attributes))
  }

  private def edgeScore(a: TEdge, b: TEdge, cfg: DeduplicationConfig): Double = {
    val emb =
      if (a.fact_embedding.nonEmpty && b.fact_embedding.nonEmpty) cos(a.fact_embedding, b.fact_embedding) else 0.0
    val st = if (a.source_uuid == b.source_uuid && a.target_uuid == b.target_uuid) Deduplicator.StructuralBoost else 0.0
    r6(cfg.nameWeight * tokenCosine(a.fact, b.fact) + cfg.embeddingWeight * emb + st)
  }

  private def entityQuality(n: TNode): Double = {
    val w = n.name.split("\\s+").count(_.nonEmpty)
    val nameT = if (w >= 3 && w <= 10) 0.3 else if (n.name.nonEmpty) 0.1 else 0.0
    val labT = if (n.labels.size >= 2 && n.labels.size <= 5) 0.3 else if (n.labels.nonEmpty) 0.1 else 0.0
    val embT = if (n.name_embedding.nonEmpty) 0.2 else 0.0
    val attrT = if (n.attributes.nonEmpty) 0.2 else 0.0
    math.min(nameT + labT + embT + attrT, 1.0)
  }

  // union-find over pairs
  private def components(ids: Seq[String], pairs: Seq[(String, String)]): Map[String, Seq[String]] = {
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: String): String = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = if (ra < rb) ra else rb
    }
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    ids.filter(inPairs).groupBy(find).map { case (k, v) => k -> v.sortBy(identity) }
  }

  // deterministic member order: created_at asc (nulls last), uuid asc
  private def memberOrder(ns: Seq[TNode]): Seq[TNode] =
    ns.sortBy(n => (Option(n.created_at).map(_.getTime).getOrElse(Long.MaxValue), n.uuid))

  private def mergeModel(members: Seq[TNode]): TNode = {
    val m = memberOrder(members)
    val rep = m.head
    val labels = m.flatMap(_.labels).distinct
    val keys = m.flatMap(_.attributes.keys).distinct
    val attrs = keys.map { k =>
      val vs = m.flatMap(n => n.attributes.get(k)).distinct
      k -> vs.mkString(" | ")
    }.toMap
    val created = m.map(_.created_at).filter(_ != null).minBy(_.getTime)
    val emb = m.find(n => n.name_embedding != null && n.name_embedding.nonEmpty) match {
      case Some(n) => n.name_embedding
      case None    => m.head.name_embedding
    }
    TNode(rep.uuid, rep.name, rep.group_id, labels, created, emb, rep.summary, attrs)
  }

  // ---------- fixtures ----------

  private val emb1 = Seq(1.0f, 0.0f, 0.5f, 0.2f)
  private val emb2 = Seq(0.9f, 0.1f, 0.5f, 0.2f)
  private val embX = Seq(-1.0f, 0.5f, 0.0f, 0.9f)

  private def fixtureNodes = Seq(
    TNode("n1", "acme corporation inc", "g", Seq("Organization"), ts(1), emb1, "s1", Map("hq" -> "berlin", "size" -> "big")),
    TNode("n2", "acme corporation incorporated", "g", Seq("Company", "Organization"), ts(2), emb2, "s2", Map("hq" -> "berlin", "size" -> "small")),
    TNode("n3", "zeta widgets ltd", "g", Seq("Organization"), ts(3), embX, "s3", Map("hq" -> "tokyo")),
  )

  test("entity pairs: weighted score combines name, embedding and attributes") {
    val cfg = DeduplicationConfig(similarityThreshold = 0.8)
    val pairs = Deduplicator
      .duplicateEntityPairs(fixtureNodes.toDF(), cfg)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(pairs.length == 1)
    val (u1, u2, sim) = pairs.head
    assert((u1, u2) == ("n1", "n2"))
    assert(sim == entityScore(fixtureNodes(0), fixtureNodes(1), cfg))
  }

  test("merge strategy: labels union, attribute conflicts join, earliest created_at") {
    val res = Deduplicator.deduplicateEntities(fixtureNodes.toDF(), DeduplicationConfig(conflictResolution = "merge"))
    assert(res.duplicatesFound == 1 && res.itemsDeduplicated == 1 && res.conflictsResolved == 1)
    val rows = res.resolved.as[TNode].collect().sortBy(_.uuid)
    assert(rows.map(_.uuid).toSeq == Seq("n1", "n3"))
    val m = rows.head
    assert(m.name == "acme corporation inc" && m.summary == "s1")
    assert(m.labels == Seq("Organization", "Company"))
    assert(m.attributes == Map("hq" -> "berlin", "size" -> "big | small"))
    assert(m.created_at == ts(1))
    assert(m.name_embedding == emb1)
  }

  test("keep_newer / keep_older / keep_better pick the right representative") {
    def run(strategy: String) =
      Deduplicator
        .deduplicateEntities(fixtureNodes.toDF(), DeduplicationConfig(conflictResolution = strategy))
        .resolved
        .as[TNode]
        .collect()
        .map(_.uuid)
        .sorted
        .toSeq
    assert(run("keep_newer") == Seq("n2", "n3"))
    assert(run("keep_older") == Seq("n1", "n3"))
    // quality: n2 has 2 labels (0.3) vs n1's 1 (0.1); both 3-10 name words,
    // embeddings, attributes → n2 better
    assert(entityQuality(fixtureNodes(1)) > entityQuality(fixtureNodes(0)))
    assert(run("keep_better") == Seq("n2", "n3"))
    assert(run("keep_first") == Seq("n1", "n3"))
  }

  private def fixtureEdges = Seq(
    TEdge("e1", "a", "b", "works_at", "alice works at acme corp", "g", ts(1), emb1, Seq("ep1"), None, Some(ts(1)), None),
    TEdge("e2", "a", "b", "works_at", "alice works at acme corporation", "g", ts(2), emb2, Seq("ep2", "ep1"), None, Some(ts(2)), None),
    TEdge("e3", "a", "c", "knows", "alice knows carol", "g", ts(3), embX, Seq("ep3"), None, None, None),
  )

  test("edge dedup: structural boost + fact merge ' | ', episodes union") {
    val cfg = DeduplicationConfig(similarityThreshold = 0.8)
    val pairs = Deduplicator
      .duplicateEdgePairs(fixtureEdges.toDF(), cfg)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq(("e1", "e2", edgeScore(fixtureEdges(0), fixtureEdges(1), cfg))))

    val res = Deduplicator.deduplicateEdges(fixtureEdges.toDF(), cfg)
    val rows = res.resolved.as[TEdge].collect().sortBy(_.uuid)
    assert(rows.map(_.uuid).toSeq == Seq("e1", "e3"))
    val m = rows.head
    assert(m.fact == "alice works at acme corp | alice works at acme corporation")
    assert(m.episodes == Seq("ep1", "ep2"))
    assert(m.created_at == ts(1) && m.valid_at.contains(ts(1)))
  }

  test("no duplicates → table passes through with zero stats") {
    val lone = Seq(fixtureNodes(2)).toDF()
    val res = Deduplicator.deduplicateEntities(lone)
    assert(res.duplicatesFound == 0 && res.itemsDeduplicated == 0)
    assert(res.resolved.count() == 1)
  }

  // ---------- randomized differential vs the in-memory model ----------

  private val vocab = "red blue green fast slow big small acme widget corp north south lane park".split(" ")

  private def randomNodes(seed: Long, n: Int): Seq[TNode] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val words = (0 until 2 + rnd.nextInt(3)).map(_ => vocab(rnd.nextInt(vocab.length)))
      val base = Array.fill(4)(rnd.nextFloat() * 2 - 1)
      TNode(
        f"u$i%03d",
        words.mkString(" "),
        "g",
        (0 until 1 + rnd.nextInt(3)).map(j => s"L${rnd.nextInt(4)}").distinct,
        ts(rnd.nextInt(50)),
        if (rnd.nextBoolean()) base.toSeq else Seq.empty,
        s"sum$i",
        (0 until rnd.nextInt(3)).map(j => s"k${rnd.nextInt(3)}" -> s"v${rnd.nextInt(2)}").toMap,
      )
    }
  }

  test("randomized differential: engine == model for pairs, merge and keep_*") {
    for (seed <- 1L to 4L) {
      val nodes = randomNodes(seed + TestSeeds.offset * 100, 40)
      val cfg = DeduplicationConfig(similarityThreshold = 0.8, conflictResolution = "merge")
      val df = nodes.toDF()

      // pairs
      val expectedPairs = (for {
        a <- nodes; b <- nodes if a.uuid < b.uuid
        s = entityScore(a, b, cfg) if s >= cfg.similarityThreshold
      } yield (a.uuid, b.uuid, s)).sortBy(p => (p._1, p._2))
      val gotPairs = Deduplicator
        .duplicateEntityPairs(df, cfg)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2))
        .toSeq
      assert(gotPairs == expectedPairs, s"pair mismatch at seed $seed")

      // merge resolution
      val comps = components(nodes.map(_.uuid), expectedPairs.map(p => (p._1, p._2)))
      val byId = nodes.map(n => n.uuid -> n).toMap
      val inComp = comps.values.flatten.toSet
      val expectedResolved =
        (nodes.filterNot(n => inComp(n.uuid)) ++ comps.values.map(ms => mergeModel(ms.map(byId))))
          .sortBy(_.uuid)
      val gotResolved = Deduplicator
        .deduplicateEntities(df, cfg)
        .resolved
        .as[TNode]
        .collect()
        .sortBy(_.uuid)
        .toSeq
      // attribute-map and label comparisons are order-insensitive only
      // where the model is (maps); labels/attr values are deterministic
      assert(gotResolved.map(_.uuid) == expectedResolved.map(_.uuid), s"uuid set mismatch at seed $seed")
      gotResolved.zip(expectedResolved).foreach { case (g, e) =>
        assert(g == e, s"row mismatch at seed $seed for ${g.uuid}")
      }

      // keep_better resolution picks max quality (ties: earliest, then uuid)
      val better = Deduplicator
        .deduplicateEntities(df, cfg.copy(conflictResolution = "keep_better"))
        .resolved
        .as[TNode]
        .collect()
        .map(_.uuid)
        .sorted
        .toSeq
      val expectedBetter =
        (nodes.filterNot(n => inComp(n.uuid)).map(_.uuid) ++ comps.values.map { ms =>
          ms.map(byId)
            .sortBy(n => (-entityQuality(n), Option(n.created_at).map(_.getTime).getOrElse(Long.MaxValue), n.uuid))
            .head
            .uuid
        }).sorted
      assert(better == expectedBetter, s"keep_better mismatch at seed $seed")
    }
  }

  test("randomized: LSH-block config — no false positives; token-sharing pairs recall-exact") {
    // With threshold 1.2 / weights (0.6, 1.0, 0.4) the non-text terms can
    // cross alone, so the engine adds the embedding-LSH block. LSH recall
    // on token-DISJOINT pairs is probabilistic by design; the exact
    // guarantees are: (a) every emitted pair matches the model's score
    // (precision), (b) every model pair that shares a name token is
    // emitted (the token block stays recall-exact).
    val cfg = DeduplicationConfig(similarityThreshold = 1.2, embeddingWeight = 1.0, attributeWeight = 0.4)
    for (seed <- 10L to 12L) {
      val nodes = randomNodes(seed + TestSeeds.offset * 100, 35)
      val model = (for {
        a <- nodes; b <- nodes if a.uuid < b.uuid
        s = entityScore(a, b, cfg) if s >= cfg.similarityThreshold
      } yield (a.uuid, b.uuid) -> s).toMap
      val got = Deduplicator
        .duplicateEntityPairs(nodes.toDF(), cfg)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
        .toMap
      got.foreach { case (k, s) =>
        assert(model.get(k).contains(s), s"false positive or score drift at seed $seed: $k -> $s vs ${model.get(k)}")
      }
      val byId = nodes.map(n => n.uuid -> n).toMap
      model.foreach { case (k @ (u1, u2), s) =>
        if (toks(byId(u1).name).intersect(toks(byId(u2).name)).nonEmpty)
          assert(got.get(k).contains(s), s"token-sharing pair missed at seed $seed: $k")
      }
    }
  }

  test("randomized edge-pair differential: prefix-filtered blocking == all-pairs model") {
    // sentence-like facts share template tokens ("lives", "in") — the
    // prefix filter must drop none of the ≥-threshold pairs the O(n²)
    // model finds, while never blocking on corpus-wide tokens beyond the
    // rarest-first prefix
    val cfg = DeduplicationConfig(similarityThreshold = 0.8)
    for (seed <- 21L to 24L) {
      val rnd = new scala.util.Random(seed + TestSeeds.offset * 100)
      val mids = Seq("lives in", "works at", "is part of")
      val edges = (0 until 40).map { i =>
        val extra = if (rnd.nextBoolean()) " " + vocab(rnd.nextInt(vocab.length)) else ""
        TEdge(
          f"e$i%03d",
          s"s${rnd.nextInt(6)}",
          s"t${rnd.nextInt(6)}",
          "r",
          s"${vocab(rnd.nextInt(vocab.length))} ${mids(rnd.nextInt(3))} ${vocab(rnd.nextInt(vocab.length))}$extra",
          "g",
          ts(rnd.nextInt(50)),
          if (rnd.nextBoolean()) Array.fill(4)(rnd.nextFloat() * 2 - 1).toSeq else Seq.empty[Float],
          Seq(s"ep$i"),
          None,
          Some(ts(i % 50)),
          None,
        )
      }
      val expected = (for {
        a <- edges; b <- edges if a.uuid < b.uuid
        s = edgeScore(a, b, cfg) if s >= cfg.similarityThreshold
      } yield (a.uuid, b.uuid, s)).sortBy(p => (p._1, p._2))
      val got = Deduplicator
        .duplicateEdgePairs(edges.toDF(), cfg)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2))
        .toSeq
      assert(got == expected, s"edge pair mismatch at seed $seed")
    }
  }

  test("edge blocking adds the embedding-LSH block when the embedding weight alone can cross") {
    val cfg = DeduplicationConfig(similarityThreshold = 0.4, embeddingWeight = 0.5)
    val es = Seq(
      fixtureEdges(0).copy(uuid = "y1", source_uuid = "p", target_uuid = "q", fact = "alpha beta", fact_embedding = emb1),
      fixtureEdges(0).copy(uuid = "y2", source_uuid = "r", target_uuid = "s", fact = "gamma delta", fact_embedding = emb1),
    )
    val pairs = Deduplicator.duplicateEdgePairs(es.toDF(), cfg).collect()
    assert(pairs.length == 1 && pairs.head.getString(0) == "y1")
  }

  test("attribute-only duplicates are found (attribute block; empty embeddings)") {
    // token-disjoint names, NO embeddings, identical attributes: with
    // attributeWeight = 1.0 the pair scores 1.0 ≥ 0.8, and only the
    // attribute (key=value) block can generate the candidate
    val cfg = DeduplicationConfig(similarityThreshold = 0.8, nameWeight = 0.0, embeddingWeight = 0.0, attributeWeight = 1.0)
    val ns = Seq(
      TNode("a1", "alpha beta", "g", Seq("L"), ts(1), Seq.empty, "", Map("k" -> "v", "j" -> "w")),
      TNode("a2", "gamma delta", "g", Seq("L"), ts(2), Seq.empty, "", Map("k" -> "v", "j" -> "w")),
    )
    val pairs = Deduplicator.duplicateEntityPairs(ns.toDF(), cfg).collect()
    assert(pairs.length == 1 && pairs.head.getString(0) == "a1" && pairs.head.getDouble(2) == 1.0)
  }

  test("incremental: out-of-scope existing duplicates pass through; batch duplicates resolve") {
    // (a) n1/n2 are mutual duplicates but both PRE-EXIST and share no
    // block key with the batch (n3) → outside the scoped rescan, an
    // incremental call leaves all three (a bulk pass would merge n1/n2)
    val resA = Deduplicator.deduplicateIncremental(
      Seq(fixtureNodes(0), fixtureNodes(1)).toDF(),
      Seq(fixtureNodes(2)).toDF(),
    )
    assert(resA.duplicatesFound == 0 && resA.resolved.count() == 3)
    // (b) incoming n2 duplicates existing n1 → resolves exactly as the
    // full dedup over the same three rows would
    val cfg = DeduplicationConfig(conflictResolution = "merge")
    val resB = Deduplicator.deduplicateIncremental(
      Seq(fixtureNodes(0), fixtureNodes(2)).toDF(),
      Seq(fixtureNodes(1)).toDF(),
      cfg,
    )
    val full = Deduplicator.deduplicateEntities(fixtureNodes.toDF(), cfg)
    assert(resB.duplicatesFound == 1 && resB.conflictsResolved == 1)
    assert(
      resB.resolved.as[TNode].collect().sortBy(_.uuid).toSeq ==
        full.resolved.as[TNode].collect().sortBy(_.uuid).toSeq,
    )
  }

  test("incremental: in-scope existing duplicates merge (reference full-matrix parity)") {
    // The reference's deduplicate_incremental concatenates existing+new
    // and rescans the FULL matrix (deduplicator.py:131-141), so two
    // existing duplicates touched by the batch's blocks merge too. n4 is
    // a batch row identical to existing n1; existing n2 shares its block
    // → incremental over (n1, n2 | n4) must equal the bulk dedup of all 3.
    val n4 = fixtureNodes(0).copy(uuid = "n4", created_at = ts(9), summary = "s4")
    val cfg = DeduplicationConfig(conflictResolution = "merge")
    val inc = Deduplicator.deduplicateIncremental(
      Seq(fixtureNodes(0), fixtureNodes(1)).toDF(),
      Seq(n4).toDF(),
      cfg,
    )
    val full = Deduplicator.deduplicateEntities(Seq(fixtureNodes(0), fixtureNodes(1), n4).toDF(), cfg)
    assert(inc.duplicatesFound == full.duplicatesFound && inc.duplicatesFound >= 2)
    assert(
      inc.resolved.as[TNode].collect().sortBy(_.uuid).toSeq ==
        full.resolved.as[TNode].collect().sortBy(_.uuid).toSeq,
    )
  }

  test("hot block keys are capped; identical names still pair via the exact-name block") {
    // every token of the target name is corpus-hot under cap=3 ("common"
    // df 6, "target" df 5) — only the nm: exact-name key, which the cap
    // exempts, can produce the (h5, h6) candidate. The uniq* tokens stay
    // under the cap but are unshared; no other pair crosses the threshold.
    val cfg = DeduplicationConfig(similarityThreshold = 0.8, hotBlockCap = 3)
    val ns = Seq(
      TNode("h1", "common uniqa", "g", Seq("L"), ts(1), embX, "", Map.empty),
      TNode("h2", "common uniqb", "g", Seq("L"), ts(2), embX, "", Map.empty),
      TNode("h3", "common uniqc target", "g", Seq("L"), ts(3), embX, "", Map.empty),
      TNode("h4", "common uniqd target", "g", Seq("L"), ts(4), embX, "", Map.empty),
      TNode("h5", "common target", "g", Seq("L"), ts(5), emb1, "", Map.empty),
      TNode("h6", "common target", "g", Seq("L"), ts(6), emb1, "", Map.empty),
      TNode("h7", "uniqe target", "g", Seq("L"), ts(7), embX, "", Map.empty),
    )
    val pairs = Deduplicator
      .duplicateEntityPairs(ns.toDF(), cfg)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq
    assert(pairs == Seq(("h5", "h6")))
  }

  test("hot-block cap derives from the affordable-pairs budget; opt-up is explicit") {
    // derivation: cap = √(2·budget) — budget 50 pairs → cap 10 rows;
    // explicit hotBlockCap overrides; default budget 2M → cap 2000
    assert(DeduplicationConfig(maxPairsPerBlock = 50).effectiveHotBlockCap == 10)
    assert(DeduplicationConfig(maxPairsPerBlock = 50, hotBlockCap = 3).effectiveHotBlockCap == 3)
    assert(DeduplicationConfig().effectiveHotBlockCap == 2000)

    // synthetic hot-block corpus: 120 rows, every block key (shared token,
    // shared embedding signature) is one corpus-hot block; names all
    // distinct so the exempt nm: block never pairs. Under the derived cap
    // the hot blocks are dropped → ZERO candidates (sub-quadratic: the
    // quadratic join never materializes); opting up past the block size
    // admits all C(120,2) pairs at a threshold every candidate crosses.
    import spark.implicits._
    val ns = (0 until 120).map(i => TNode(f"q$i%03d", s"hot uniq$i", "g", Seq("L"), ts(i), embX, "", Map.empty))
    val low = DeduplicationConfig(similarityThreshold = 0.1, maxPairsPerBlock = 50)
    assert(Deduplicator.duplicateEntityPairs(ns.toDF(), low).count() == 0L)
    val optUp = DeduplicationConfig(similarityThreshold = 0.1, hotBlockCap = 500)
    assert(Deduplicator.duplicateEntityPairs(ns.toDF(), optUp).count() == (120L * 119L) / 2L)
  }

  test("incremental edges: batch edge adopts into the existing duplicate; others untouched") {
    val cfg = DeduplicationConfig(similarityThreshold = 0.8)
    val res = Deduplicator.deduplicateIncremental(
      Seq(fixtureEdges(0), fixtureEdges(2)).toDF(),
      Seq(fixtureEdges(1)).toDF(),
      cfg,
      edges = true,
    )
    val rows = res.resolved.as[TEdge].collect().sortBy(_.uuid)
    assert(rows.map(_.uuid).toSeq == Seq("e1", "e3"))
    assert(rows.head.episodes == Seq("ep1", "ep2"))
  }

  test("blocking adds the embedding-LSH block when non-text weights can cross the threshold") {
    // two token-disjoint nodes with IDENTICAL embeddings and attributes:
    // emb 1.0 + attr 0.4 ≥ threshold 1.2 only via non-text terms
    val cfg = DeduplicationConfig(similarityThreshold = 1.2, embeddingWeight = 1.0, attributeWeight = 0.4)
    val ns = Seq(
      TNode("x1", "alpha beta", "g", Seq("L"), ts(1), emb1, "", Map("k" -> "v")),
      TNode("x2", "gamma delta", "g", Seq("L"), ts(2), emb1, "", Map("k" -> "v")),
    )
    val pairs = Deduplicator.duplicateEntityPairs(ns.toDF(), cfg).collect()
    assert(pairs.length == 1 && pairs.head.getString(0) == "x1")
  }
}
