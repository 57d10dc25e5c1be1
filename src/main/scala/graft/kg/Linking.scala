package graft.kg

import graft.dedup.Dedup
import graft.graph.GraphOps
import graft.search.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity linking / canonicalization — the deterministic stand-in for the
  * reference's LLM node-dedup, with the same surrounding algebra
  * (SURVEY.md §7.0):
  *
  *  1. candidate blocking (`bulk_utils.py:266-294`): instead of the
  *     reference's O(n²) word-overlap loop, a union of two cheap blocked
  *     joins — exact normalized-name key, and MinHash-LSH over character
  *     3-grams (catches alias spellings the key misses);
  *  2. scoring: normalized-name equality OR char-3-gram Jaccard ≥ 0.8 OR
  *     name-embedding cosine ≥ 0.8 (the reference's node threshold,
  *     `bulk_utils.py:258`);
  *  3. canonicalization: connected components over duplicate pairs,
  *     canonical = lexicographically smallest uuid — exactly
  *     `compress_uuid_map` (`bulk_utils.py:433-470`);
  *  4. pointer remap (`resolve_edge_pointers`, `bulk_utils.py:476-483`):
  *     two broadcast joins with coalesce(mapped, original).
  *
  * Skew note (north rule): blocking keys are Zipf-hot for common surface
  * forms. The normalized-key join caps each block via an internal salt of
  * the key with a group counter only if needed; at this corpus's shapes
  * AQE's skew-join split handles it — the key join is still an equi join
  * Catalyst can split.
  */
object Linking {

  /** Normalized alias key: lowercase, digits unpadded, non-alnum dropped.
    * "Customer#000000042" and "Customer#42" → "customer42".
    *
    * A name with NO [a-z0-9] characters (punctuation-only, CJK/other
    * non-ASCII scripts) would normalize to "" — and since exact-key pairs
    * are accepted as duplicates by construction, every such name in a
    * group would silently merge into one entity. Those names fall back to
    * their raw lowercased form (namespaced so it can never collide with a
    * real normalized key): identical surfaces still unify, distinct ones
    * stay distinct.
    */
  def normName(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val norm = regexp_replace(
      regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", " "), "\\b0+(\\d)", "$1"),
      " ",
      "",
    )
    when(norm === "", concat(lit("raw:"), lower(trim(c)))).otherwise(norm)
  }

  /** Word-token set of a name (the reference's dedup-blocking token
    * contract: `name.lower().split()`, bulk_utils.py:279-281).
    */
  private def nameTokens(c: org.apache.spark.sql.Column) =
    array_distinct(split(lower(c), "\\s+"))

  /** nodes (uuid, name[, name_embedding]) → duplicate pairs (u1, u2),
    * u1 < u2, deduped. Two blocked joins:
    *  - exact normalized-alias key (catches padded/unpadded id spellings);
    *  - MinHash-LSH over word tokens, verified by token-Jaccard ≥ 0.8 —
    *    the reference's word-overlap ∪ cosine≥0.8 blocking
    *    (bulk_utils.py:274-293) with LSH replacing the O(n²) sweep.
    * Word-level (not char-level) similarity is deliberate: ID-like names
    * ("Customer#000000001" vs "...002") are char-trigram-similar but NOT
    * duplicates; whole-token overlap keeps them apart.
    */
  /** Blocking keys of a node set: (key, uuid, name, group_id), where key
    * is the group-scoped exact normalized-name key or one of the 8 MinHash
    * band keys. Two nodes can be duplicate candidates ONLY if they share a
    * key (this is precisely [[duplicatePairs]]' candidate space).
    * Persisted as the `node_blocks` index so incremental linking probes
    * only the keys a batch touches instead of re-blocking the corpus
    * (IncrementalIngest; reference: incremental_updater.py:94-388). The
    * (name, group_id) payload rides along — exactly what
    * [[duplicatePairs]] consumes — so the candidate probe reads THIS index
    * alone instead of chasing candidate uuids into a second scattered
    * nodes_raw bucket read (uuids hash uniformly: that read touched every
    * bucket on every micro-batch).
    */
  def blockingKeys(nodes: DataFrame): DataFrame = {
    val grouped =
      if (nodes.columns.contains("group_id")) nodes
      else nodes.withColumn("group_id", lit("default"))
    val base = grouped.select(col("group_id").as("g"), col("uuid"), col("name"))
    val exact = base.select(
      concat(col("g"), lit("|k|"), normName(col("name"))).as("key"),
      col("uuid"),
      col("name"),
      col("g").as("group_id"),
    )
    val bands = base
      .withColumn("sh", nameTokens(col("name")))
      .filter(size(col("sh")) >= 2)
      .withColumn("mh", Dedup.minhashSignature(col("sh"), 8))
      .select(
        col("g"),
        col("uuid"),
        col("name"),
        explode(array((0 until 8).map(k => concat(lit(s"$k:"), element_at(col("mh"), k + 1))): _*)).as("band"),
      )
      .select(concat(col("g"), lit("|b|"), col("band")).as("key"), col("uuid"), col("name"), col("g").as("group_id"))
    // no final distinct: the union is duplicate-free by construction — the
    // exact key is one namespaced (`|k|`) row per node, and each of the 8
    // band keys carries its band index prefix (`0:`..`7:`) under the `|b|`
    // namespace, so no two rows of one node can collide and rows of
    // different nodes differ in uuid. The old `.distinct()` was a full
    // extra shuffle of ~9 rows/node (the dominant exchange of the
    // node_blocks build) that removed nothing (guide §2.4: remove shuffles
    // outright — a distinct on data that is already unique).
    exact.unionByName(bands)
  }

  def duplicatePairs(nodes: DataFrame): DataFrame = {
    // group isolation: blocking keys are scoped by group_id — two tenants
    // mentioning "Acme" must NOT link (the reference partitions every node
    // op by group_id, huggingface_driver.py:535-554). Frames without a
    // group_id column (single-tenant tests) get one implicit group.
    val grouped =
      if (nodes.columns.contains("group_id")) nodes
      else nodes.withColumn("group_id", lit("default"))
    val base = grouped.select(col("group_id").as("g"), col("uuid"), col("name"))
    // ONE pass computes both blocking families — exact normalized-name key
    // (kind 'k') and the 8 MinHash band keys over word tokens (kind 'b';
    // single-token names are key-block territory) — checkpointed so the
    // self-join reads it from storage twice instead of running the
    // normName regexes + MinHash twice, and so the join shuffles slim
    // (g, kind, key, uuid) rows instead of carrying token arrays on both
    // sides. Band candidates are verified afterwards by joining the token
    // sets back in (candidates are few; the corpus-sized frames stay slim).
    // the key string never leaves the join, so it is folded to ONE 64-bit
    // xxhash64 (guide §2.3: narrower join keys — the checkpoint and the
    // self-join's exchange/hashmap carry 8 bytes instead of a normalized
    // name / band string). Deterministic, so candidates are stable; a
    // cross-key collision would need two distinct normalized names among
    // the corpus' ~10^6 keys to share a 64-bit hash (P ≈ m²/2^65 ≈ 10⁻⁷,
    // and the kind column still separates the k/b namespaces) — the same
    // determinism class as the MinHash band keys themselves, and the
    // full oracle gate re-verifies the end-to-end values at every SF.
    val kk = base
      .select(col("g"), col("uuid"), lit("k").as("kind"), xxhash64(normName(col("name"))).as("key"))
      .unionByName(
        base
          .withColumn("sh", nameTokens(col("name")))
          .filter(size(col("sh")) >= 2)
          .withColumn("mh", Dedup.minhashSignature(col("sh"), 8))
          .select(
            col("g"),
            col("uuid"),
            lit("b").as("kind"),
            explode(array((0 until 8).map(k => xxhash64(lit(k), element_at(col("mh"), k + 1))): _*)).as("key"),
          ),
      )
      .localCheckpoint()
    val cand = kk
      .select(col("g"), col("kind"), col("key"), col("uuid").as("u1"))
      .join(kk.select(col("g"), col("kind"), col("key"), col("uuid").as("u2")), Seq("g", "kind", "key"))
      .filter(col("u1") < col("u2"))
    // exact-key pairs are duplicates by construction (equal normalized name)
    val keyPairs = cand.filter(col("kind") === "k").select(col("u1"), col("u2"))
    // band pairs: verify by exact token-Jaccard ≥ 0.8 — the reference's
    // word-overlap ∪ cosine≥0.8 blocking (bulk_utils.py:274-293) with LSH
    // replacing the O(n²) sweep
    val bandCand = cand.filter(col("kind") === "b").select(col("u1"), col("u2")).dropDuplicates("u1", "u2")
    val toks = base.select(col("uuid"), nameTokens(col("name")).as("sh")).filter(size(col("sh")) >= 2)
    val lshPairs = bandCand
      .join(toks.select(col("uuid").as("u1"), col("sh").as("s1")), Seq("u1"))
      .join(toks.select(col("uuid").as("u2"), col("sh").as("s2")), Seq("u2"))
      .filter(Dedup.jaccard(col("s1"), col("s2")) >= 0.8)
      .select(col("u1"), col("u2"))
    keyPairs.unionByName(lshPairs).dropDuplicates("u1", "u2")
  }

  /** Duplicate pairs → (uuid, canonical) map covering every node that is
    * part of any duplicate component (nodes not in the map keep their own
    * uuid — coalesce at remap time).
    */
  def canonicalMap(pairs: DataFrame): DataFrame =
    GraphOps
      // duplicate-pair graphs are ∝ near-duplicate surfaces — the bounded
      // driver union-find path labels the common (small) case in one job
      // instead of the superstep loop's 6-10 quanta; value-identical
      .connectedComponentsAuto(pairs.select(col("u1").as("src"), col("u2").as("dst")))
      .select(col("node").as("uuid"), col("component").as("canonical"))

  /** Remap edge endpoint uuids through the canonical map
    * (resolve_edge_pointers): map joins + coalesce. The map covers only
    * duplicate components, so it is usually tiny and broadcast; pass
    * `hint = false` for duplicate-heavy corpora where the map outgrows a
    * broadcast (callers can size it from commit metadata,
    * SnapshotStore.approxRowCount) — the joins then plan as ordinary
    * shuffled equi-joins.
    */
  def remapPointers(edges: DataFrame, uuidMap: DataFrame, hint: Boolean = true): DataFrame = {
    val m = if (hint) broadcast(uuidMap) else uuidMap
    edges
      .join(m.withColumnRenamed("uuid", "source_uuid").withColumnRenamed("canonical", "src_c"), Seq("source_uuid"), "left")
      .join(m.withColumnRenamed("uuid", "target_uuid").withColumnRenamed("canonical", "dst_c"), Seq("target_uuid"), "left")
      .withColumn("source_uuid", coalesce(col("src_c"), col("source_uuid")))
      .withColumn("target_uuid", coalesce(col("dst_c"), col("target_uuid")))
      .drop("src_c", "dst_c")
  }
}
