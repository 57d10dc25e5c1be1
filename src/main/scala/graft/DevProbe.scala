package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch dev probe for round-6 optimization (not part of the driver
  * contract): per-phase timing of individual operators.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](tag: String)(b: => T): T = {
      val t0 = System.nanoTime(); val r = b
      println(f"[probe] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warm JIT on tiny SF
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    args.headOption.getOrElse("cc") match {
      case "cc" =>
        val e = graft.queries.Graph.edges(spark, sfDir)
        t("edges count")(e.count())
        val (df, it) = t("cc total")(graft.graph.GraphOps.connectedComponentsIter(e))
        t("cc result count")(df.count())
        println(s"[probe] cc supersteps: $it")
        val (df2, it2) = t("cc total rep2")(graft.graph.GraphOps.connectedComponentsIter(e))
        t("cc result count2")(df2.count())
        println(s"[probe] cc supersteps: $it2")
      case "ccsteps" =>
        // instrumented copy of connectedComponentsIter's loop
        import org.apache.spark.storage.StorageLevel
        val edges = graft.queries.Graph.edges(spark, sfDir)
        val e = graft.graph.GraphOps.undirect(edges).persist(StorageLevel.MEMORY_AND_DISK)
        var labels = t("init labels")(
          graft.graph.GraphOps.nodes(e).withColumn("label", col("node")).localCheckpoint(),
        )
        var converged = false
        var iter = 0
        while (!converged && iter < 50) {
          iter += 1
          val own = labels.select(col("node"), col("label"), lit(true).as("own"))
          val propagated = e
            .join(labels, e("src") === labels("node"))
            .select(col("dst").as("node"), col("label"), lit(false).as("own"))
          val l1 = own
            .unionByName(propagated)
            .groupBy(col("node"))
            .agg(min(col("label")).as("label"), max(when(col("own"), col("label"))).as("old"))
          val parents = l1.toDF("pn", "pl", "pold").select(col("pn"), col("pl"))
          val next = l1
            .join(parents, l1("label") === parents("pn"), "left")
            .select(col("node"), coalesce(col("pl"), col("label")).as("label"), col("old"))
            .localCheckpoint(eager = false)
          converged = t(s"superstep $iter")(next.filter(col("label") =!= col("old")).count() == 0L)
          labels = next.drop("old")
        }
        println(s"[probe] iters: $iter")
      case "idx" =>
        // mirrors Bench's kg_index_build phase: bulk pipeline without
        // indexes, then the concurrent bootstrap + search-index build
        Bench.cleanBenchTmp()
        val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
        val (pipeSec, _, _, store) = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = false)
        println(f"[probe] pipeline: $pipeSec%.2fs")
        val tIdx = System.nanoTime()
        graft.io.Concurrent.runAll(Seq(
          () => graft.streaming.IncrementalIngest.bootstrapIndexes(store, spark),
          () => graft.search.SearchIndexes.build(store),
        ))
        println(f"[probe] index build: ${(System.nanoTime() - tIdx) / 1e9}%.2fs")
        store.deleteRoot()
      case "idx2" =>
        // serial per-builder timing of the index-build phase (true work per
        // builder, no cross-chain CPU contention in the numbers)
        Bench.cleanBenchTmp()
        val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
        val (pipeSec, _, _, store) = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = false)
        println(f"[probe] pipeline: $pipeSec%.2fs")
        t("boot(all)")(graft.streaming.IncrementalIngest.bootstrapIndexes(store, spark))
        for ((tb, id, tx) <- graft.search.SearchIndexes.TextSurfaces if store.exists(tb))
          t(s"text:$tb")(graft.search.SearchIndexes.buildText(store, tb, id, tx))
        t("ann")(graft.search.SearchIndexes.buildAnn(store))
        t("graph")(graft.search.SearchIndexes.buildGraph(store))
        t("temporal")(graft.search.SearchIndexes.buildTemporal(store))
        store.deleteRoot()
      case "idxparts" =>
        // component timing inside the expensive index builders
        Bench.cleanBenchTmp()
        val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
        val (pipeSec, _, _, store) = Bench.runPipelineStore(spark, sfDir, scale, buildIndexes = false)
        println(f"[probe] pipeline: $pipeSec%.2fs")
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val edges = store.load("edges")
        t("edges scan fact")(noop(edges.select(col("uuid"), col("fact"))))
        t("termFreqs edges")(noop(graft.search.Bm25.termFreqs(
          edges.select(col("uuid").as("id"), col("fact").as("text")))))
        t("buildText edges")(graft.search.SearchIndexes.buildText(store, "edges", "uuid", "fact"))
        t("ann project")(noop(edges.select(
          graft.sim.Ann.signatureCol(col("fact_embedding"), graft.search.SearchIndexes.annPlanes).as("sig"),
          col("uuid"), col("fact_embedding").as("v"))))
        t("buildAnn")(graft.search.SearchIndexes.buildAnn(store))
        t("pairCounts agg")(noop({
          val e = edges.select(col("source_uuid").as("src"), col("target_uuid").as("dst"))
          e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
            .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
        }))
        t("buildGraph")(graft.search.SearchIndexes.buildGraph(store))
        t("buildTemporal")(graft.search.SearchIndexes.buildTemporal(store))
        t("boot edge_endpoints distinct")(noop(
          edges.select(explode(array(col("source_uuid"), col("target_uuid"))).as("endpoint_uuid"),
            col("group_id"), col("source_uuid"), col("name")).distinct()))
        store.deleteRoot()
      case "edgespre" =>
        // micro-profile of the pipeline's edges_pre / uuid_map legs
        Bench.cleanBenchTmp()
        val scale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "8").toInt
        val pages = Bench.replicate(graft.kg.Pages.corpus(spark, sfDir), scale)
          .repartition(spark.sparkContext.defaultParallelism, col("url"))
          .localCheckpoint()
        t("pages")(pages.count())
        val withText = pages.select(col("url"), col("warc_ts"),
          coalesce(col("text"), graft.kg.HtmlText.textOf(col("html"))).as("text"))
        val triples = graft.kg.Extract.triplesTs(spark, withText.select(col("url"), col("text"), col("warc_ts")))
          .withColumn("group_id", lit("default"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("extract+cache")(triples.count())
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        val gid = "default"
        val raw = triples.select(
          md5(concat(lit(s"en|$gid|"), col("subj"))).as("source_uuid"),
          col("pred").as("name"),
          md5(concat(lit(s"en|$gid|"), col("obj"))).as("target_uuid"),
          col("fact"),
          lit(gid).as("group_id"),
          col("warc_ts").as("valid_at"),
          col("warc_ts").as("created_at"),
          array(md5(concat(lit(s"ep|$gid|"), col("url")))).as("episodes"),
        )
        t("raw project (noop)")(noop(raw))
        t("repartition (noop)")(noop(raw.repartition(col("group_id"), col("source_uuid"), col("name"))))
        t("dedupeFacts (noop)")(noop(graft.kg.Invalidation.dedupeFacts(
          raw.repartition(col("group_id"), col("source_uuid"), col("name")))))
        spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        t("dedupeFacts hi-threshold")(noop(graft.kg.Invalidation.dedupeFacts(
          raw.repartition(col("group_id"), col("source_uuid"), col("name")))))
        spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
        t("dedupe+invalidate (noop)")(noop(graft.kg.Invalidation.dedupeAndInvalidate(raw)))
        // uuid_map leg: surfaces from one agg, then linking
        val nodesFull = graft.kg.Extract.entityNodes(
          triples.select(explode(array(col("subj"), col("obj"))).as("name"), col("fact"), col("warc_ts"))
            .groupBy(col("name"))
            .agg(min(col("fact")).as("summary"), min(col("warc_ts")).as("created_at"), count(lit(1)).as("mention_count")),
          gid, keep = Seq("summary", "created_at", "mention_count"),
        ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        t("surface_agg+cache")(nodesFull.count())
        val linkInput = nodesFull.select(col("uuid"), col("name"), col("group_id"))
        val pairs = t("duplicatePairs")(graft.kg.Linking.duplicatePairs(linkInput)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        t("pairs isEmpty")(println(s"[probe] pairs empty: ${pairs.isEmpty}"))
      case "inc" =>
        // steady-batch stage profile: 1x pipeline store + indexes, then
        // three 100-page batches (first untimed) with [inc] stage timers
        Bench.cleanBenchTmp()
        val (_, _, _, store) = Bench.runPipelineStore(spark, sfDir, 1)
        val sec = t("steady batch (best of 2)")(Bench.steadyBatchSec(spark, sfDir, store, "probe"))
        println(f"[probe] steady batch: $sec%.2fs")
        store.deleteRoot()
      case "ngram" =>
        val docs = T.load(spark, sfDir, "documents").filter(col("doc_id") < 600)
        val r = t("ngram rep1")(
          graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.3).orderBy(col("i"), col("j")).count(),
        )
        println(s"[probe] rows: $r")
        t("ngram rep2")(
          graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.3).orderBy(col("i"), col("j")).count(),
        )
      case "ngram2" =>
        import graft.dedup.{Dedup => D}
        val docs = T.load(spark, sfDir, "documents").filter(col("doc_id") < 600)
        val sh = docs.select(col("doc_id").as("id"), D.shingles3(col("text")).as("sh"))
        t("shingles count")(sh.count())
        val tot = t("total shingle rows")(sh.select(explode(col("sh"))).count())
        println(s"[probe] exploded rows: $tot")
        val ex = sh.select(col("id"), explode(col("sh")).as("s")).select(col("id"), xxhash64(col("s")).as("s"))
        val joined = ex.select(col("id").as("i"), col("s"))
          .join(ex.select(col("id").as("j"), col("s")), Seq("s"))
          .filter(col("i") < col("j"))
        val jn = t("join output rows")(joined.count())
        println(s"[probe] join rows: $jn")
        val agg = joined.groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
        t("agg rows")(println(s"[probe] agg rows: ${agg.count()}"))
      case "ngram3" =>
        import graft.dedup.{Dedup => D}
        val docs = T.load(spark, sfDir, "documents").filter(col("doc_id") < 600).localCheckpoint()
        t("materialize docs")(docs.count())
        val sh = docs.select(col("doc_id").as("id"), D.shingles3(col("text")).as("sh"))
        t("explode rep1")(sh.select(explode(col("sh"))).count())
        t("explode rep2")(sh.select(explode(col("sh"))).count())
        t("explode rep3")(sh.select(explode(col("sh"))).count())
        val toks = docs.select(split(lower(col("text")), " ").as("tt"))
        t("split only")(toks.select(explode(col("tt"))).count())
        val noDistinct = docs.select(
          explode(
            transform(
              sequence(lit(1), greatest(size(split(lower(col("text")), " ")) - lit(2), lit(0))),
              i => concat_ws(" ", element_at(split(lower(col("text")), " "), i)),
            ),
          ),
        )
        t("transform no distinct")(noDistinct.count())
      case "weighted" =>
        val docs = T.load(spark, sfDir, "documents").filter(col("doc_id") < 300)
        val emb = T.load(spark, sfDir, "embeddings").select(col("vec_id"), col("embedding"))
        val nodes = docs
          .join(emb, docs("doc_id") === emb("vec_id"), "left")
          .select(
            lpad(col("doc_id").cast("string"), 6, "0").as("uuid"),
            col("text").as("name"),
            lit("default").as("group_id"),
            array(lit("Entity")).as("labels"),
            lit(null).cast("timestamp").as("created_at"),
            col("embedding").as("name_embedding"),
            lit("").as("summary"),
            map(lit("lang"), col("lang"), lit("source"), col("source")).as("attributes"),
          )
          .localCheckpoint()
        t("nodes materialize")(nodes.count())
        for (rep <- 1 to 2) {
          val r = t(s"duplicateEntityPairs rep$rep")(
            graft.dedup.Deduplicator
              .duplicateEntityPairs(nodes, graft.dedup.DeduplicationConfig(similarityThreshold = 0.8))
              .orderBy(col("u1"), col("u2"))
              .count(),
          )
          println(s"[probe] pairs: $r")
        }
      case "qtry" =>
        // run registered queries EXACTLY as Bench.timeQuery does, but
        // print the exception a failure would silently swallow
        val names = args.drop(1).headOption.getOrElse("q_dedup_ngram_jaccard").split(",").toSeq
        try graft.queries.Kg.warm(spark, sfDir)
        catch { case _: Throwable => () }
        for (n <- names; fn <- SparkEntry.queries.get(n)) {
          val t0 = System.nanoTime()
          try {
            val c = fn(spark, sfDir).count()
            println(f"[probe] $n ok rows=$c ${(System.nanoTime() - t0) / 1e9}%.2fs")
          } catch {
            case e: Throwable =>
              println(f"[probe] $n THREW after ${(System.nanoTime() - t0) / 1e9}%.2fs: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(400)}")
          }
        }
      case other => println(s"unknown probe $other")
    }
    spark.stop()
  }
}
