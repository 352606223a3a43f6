package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/**
 * Deduplication operators for training-data pipelines, all expressed as
 * shuffle-conscious DataFrame plans:
 *
 *  - exact dedup: groupBy on a 256-bit content HASH — the shuffle key is 32
 *    bytes per row, never the document text itself, so shuffle volume is
 *    O(rows), not O(corpus bytes);
 *  - MinHash-LSH near-dup: banded signature → explode bands → self-join on
 *    (band, bucket) carrying IDS ONLY — candidates meet only inside a
 *    bucket, and shingle arrays are joined back per-id afterwards instead
 *    of being shuffled once per band;
 *  - SimHash: 48-bit fingerprints; identical-print clusters, plus
 *    Hamming-distance≤k near-dup pairs via band-LSH (bands = k+1 guarantees
 *    no candidate within distance k is missed — pigeonhole);
 *  - n-gram Jaccard: exact Jaccard computed ONLY on MinHash-LSH candidate
 *    pairs (optionally intersected with a blocking key). A plain blocked
 *    self-join on a low-cardinality key is near-quadratic and deliberately
 *    not offered.
 */
object Dedup {

  /**
   * Exact deduplication: keep the smallest `idCol` per distinct `keyCol`
   * value, grouping by sha2-256 of the key so the shuffle carries a 32-byte
   * digest instead of the full text. Returns (kept id, group size).
   */
  def exact(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(sha2(col(keyCol).cast("binary"), 256).as("key_hash"))
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_dups"))

  /** Adds shingle-set and minhash-signature columns (keeps existing cols). */
  def withSignature(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("toks", TextOps.tokens(col(textCol)))
      .withColumn("thash", TextOps.tokenHashes(col("toks")))
      .withColumn("shingles", array_distinct(TextOps.shingleHashes(col("thash"))))
      .withColumn("sig", TextOps.minHashSignature(col("shingles")))

  /** (id[, extra cols], band, bucket) — one row per (doc, band). */
  private[graft] def banded(sig: DataFrame, idCol: String, extra: Seq[String]): DataFrame =
    sig.select(
      (col(idCol).as("id") +: extra.map(col)) :+
        explode(array((0 until TextOps.Bands).map(b =>
          struct(lit(b).as("band"), TextOps.bandHash(col("sig"), b).as("bucket"))
        ): _*)).as("bb"): _*)
      .select((col("id") +: extra.map(col)) :+ col("bb.band") :+ col("bb.bucket"): _*)

  /**
   * MinHash-LSH candidate pairs: documents sharing at least one band bucket.
   * Emits (id_a, id_b, jaccard) with id_a < id_b, exact Jaccard computed on
   * the candidate pairs only. `minJaccard` filters the verified pairs.
   * `blockCol` (optional) additionally requires candidates to share a
   * blocking key (e.g. language).
   *
   * Scale: BYTE-IDENTICAL texts collapse to one representative per distinct
   * (content digest, block) BEFORE signatures are computed or bands joined —
   * the same move the SimHash operator makes for identical prints. An
   * m-copy boilerplate cluster contributes ONE banded row per band instead
   * of m, so the bucket self-join never sees an intra-cluster candidate
   * (10M exact copies would otherwise push m(m-1)/2 pairs through the
   * join); intra-cluster pairs are reconstructed arithmetically from the
   * sorted id list (Jaccard exactly 1.0 — identical shingle sets), and
   * cross-cluster matches expand by joining matched representative pairs
   * back to their id lists. The band self-join itself carries
   * (rep id, band, bucket) rows only — shingle arrays never multiply
   * across bands; they join back per-representative onto the deduplicated
   * candidate set for verification.
   *
   * Parity with the uncollapsed pipeline (pinned by the oracle): documents
   * with FEWER than k tokens have an empty shingle set, a null MinHash
   * signature, null band buckets — and a null bucket joins nothing, so
   * identical short documents never paired before and are excluded from
   * the intra-cluster expansion here (`size(shingles) > 0`).
   *
   * `maxBucket` (the production skew guard): drop every (band, bucket)
   * holding MORE than `maxBucket` DISTINCT texts before the self-join. A
   * bucket a million near-identical-but-not-byte-identical boilerplate
   * variants hash into is the one place this plan goes quadratic — m(m-1)/2
   * candidate pairs materialize inside a single shuffle partition, and no
   * partitioning scheme can spread one key. Capping trades recall for a
   * hard per-bucket bound (pairs lost only if NONE of their shared buckets
   * is cold), which is how repeated-substring/LSH dedup runs at corpus
   * scale in practice. Counted over representatives, so byte-identical
   * copies never heat a bucket — their pairs come from the arithmetic
   * intra-cluster expansion, which a hot bucket does not suppress.
   */
  def minHashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double = 0.0,
      blockCol: Option[String] = None,
      maxBucket: Option[Int] = None): DataFrame = {
    val base = df.select(
      col(idCol) +: col(textCol) +: blockCol.map(b => col(b).as("block")).toSeq: _*)
    val extra = blockCol.map(_ => "block").toSeq
    // signatures + digest computed MAP-SIDE per row (text itself is never a
    // shuffle payload anywhere in this plan); cached — it feeds the band
    // explode and the shingle lookup
    val sig = withSignature(base, idCol, textCol)
      .withColumn("__digest", sha2(col(textCol).cast("binary"), 256))
      .cache()
    // exact-duplicate clusters (≥ 2 members) per (digest, block): this
    // shuffle carries (digest, id) — ~40 bytes per row — and the result is
    // proportional to the number of DUPLICATED texts, empty on a dup-free
    // corpus (singletons pay nothing downstream); cached, it feeds the band
    // filter and both expansions
    val clusters = sig
      .groupBy(col("__digest") +: extra.map(col): _*)
      .agg(min(col(idCol)).as("rep"),
        sort_array(collect_list(col(idCol))).as("ids"))
      .where(size(col("ids")) > 1)
      .cache()
    // duplicate members OTHER than their cluster's representative — the
    // rows the band join must not see (ids is sorted, so members = tail)
    val dupMembers = clusters
      .select(explode(slice(col("ids"), lit(2), size(col("ids")))).as("member"))
    // band rows for one representative per distinct text: the anti-join
    // runs over (id, band, bucket) rows, never text or shingles, and its
    // right side is only the duplicated ids
    val bands0 = banded(sig, idCol, extra)
      .join(dupMembers, col("id") === col("member"), "left_anti")
    // skew guard as ONE pass: a window count over the (band, bucket[,
    // block]) partition tags every row with its bucket size and the filter
    // drops overfull buckets — no second evaluation of the banded stream,
    // and the window's exchange partitions on EXACTLY the keys the
    // self-join needs, so one side of the join reuses it (ReusedExchange)
    // instead of shuffling again. Null buckets (empty shingles) pass
    // through unconditionally, keeping their no-pair behavior.
    val bands = maxBucket match {
      case Some(cap) =>
        val w = Window.partitionBy((Seq("band", "bucket") ++ extra).map(col): _*)
        bands0.withColumn("__n", count(lit(1)).over(w))
          .where(col("__n") <= cap || col("bucket").isNull)
          .drop("__n")
      case None => bands0
    }
    val l = bands.as("l")
    val r = bands.as("r")
    val blockCond = blockCol
      .map(_ => col("l.block") === col("r.block"))
      .getOrElse(lit(true))
    val candidates = l.join(r,
        col("l.band") === col("r.band") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.id") < col("r.id") && blockCond)
      .select(col("l.id").as("rep_a"), col("r.id").as("rep_b"))
      .dropDuplicates("rep_a", "rep_b")
    // per-representative shingle sets + member lists for verification and
    // expansion; the member-list join is LEFT against the (small) dup
    // clusters only — a singleton's list is just itself
    val sh = sig.select(col(idCol).as("rep"), col("shingles"))
      .join(dupMembers, col("rep") === col("member"), "left_anti")
      .join(clusters.select(col("rep"), col("ids")), Seq("rep"), "left")
      .withColumn("ids", coalesce(col("ids"), array(col("rep"))))
    // cross-cluster: verify Jaccard on representatives, then expand the
    // matched pair to all (ia, ib) members; least/greatest restores the
    // id_a < id_b contract regardless of which cluster holds the lower ids
    val cross = candidates
      .join(sh.as("a"), col("rep_a") === col("a.rep"))
      .join(sh.as("b"), col("rep_b") === col("b.rep"))
      .select(
        TextOps.jaccard(col("a.shingles"), col("b.shingles")).as("jaccard"),
        col("a.ids").as("ids_a"), col("b.ids").as("ids_b"))
      .where(col("jaccard") >= minJaccard)
      .select(col("jaccard"), explode(col("ids_a")).as("ia"), col("ids_b"))
      .select(col("jaccard"), col("ia"), explode(col("ids_b")).as("ib"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))
    // intra-cluster: sorted ids pair each element with every later one;
    // identical non-empty shingle sets have Jaccard exactly 1.0
    val intra = sh
      .where(size(col("ids")) > 1 && size(col("shingles")) > 0 &&
        lit(1.0) >= minJaccard)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids")))).as("id_b"))
      .select(col("id_a"), col("id_b"), lit(1.0).as("jaccard"))
    CacheScope.unpersistAfterAction(cross.unionByName(intra), Seq(sig, clusters))
  }

  /**
   * SimHash duplicate clusters: rows sharing an identical 48-bit SimHash.
   * Returns (simhash, kept_id, n_dups) for clusters of size > 1.
   */
  def simHashClusters(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        TextOps.simHash(TextOps.tokenHashesWide(TextOps.tokens(col(textCol))))
          .as("simhash"))
      .groupBy("simhash")
      .agg(min(col(idCol)).as("kept_id"), count(lit(1)).as("n_dups"))
      .where(col("n_dups") > 1)

  /**
   * SimHash near-duplicate pairs within Hamming distance `maxHamming`.
   * Candidates come from Hamming-band LSH: the 48-bit print splits into
   * (maxHamming + 1) bands, and any pair within the distance budget shares
   * at least one identical band (pigeonhole), so recall is exact; the
   * verification step computes the true Hamming distance on candidates only.
   */
  def simHashHammingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame =
    hammingHashPairs(
      df.select(col(idCol),
        TextOps.simHash(TextOps.tokenHashesWide(TextOps.tokens(col(textCol))))
          .as("print")),
      idCol, "print", TextOps.SimHashBits, maxHamming)

  /**
   * [[simHashHammingPairs]]' banding/verify machinery over an ALREADY-
   * COMPUTED fingerprint column — the form the perceptual image hashes
   * (pHash/dHash, [[Multimodal.imageHashes]]) share with text SimHash:
   * any `bits`-wide print within `maxHamming` shares one of
   * `maxHamming + 1` identical bands (pigeonhole — recall exact),
   * candidates verify by true Hamming distance, identical prints
   * collapse BEFORE the band self-join (a boilerplate/meme flood of m
   * copies costs one banded row per band, never m² candidates). `bits`
   * must leave the sign bit clear (≤ 63): the band extraction is an
   * arithmetic shift.
   */
  def hammingHashPairs(
      df: DataFrame,
      idCol: String,
      hashCol: String,
      bits: Int,
      maxHamming: Int): DataFrame = {
    require(bits > 0 && bits <= 63, "hammingHashPairs: bits must be 1..63")
    val bands = maxHamming + 1
    val width = (bits + bands - 1) / bands
    val clusters = df
      .select(col(idCol).as("id"), col(hashCol).as("print"))
      .groupBy("print")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .cache()
    val bandedPrints = clusters.select(
      col("print"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          TextOps.simHashBand(col("print"), b, width).as("value"))): _*))
        .as("bv"))
      .select(col("print"), col("bv.band"), col("bv.value"))
    val printPairs = bandedPrints.as("l")
      .join(bandedPrints.as("r"),
        col("l.band") === col("r.band") &&
          col("l.value") === col("r.value") &&
          col("l.print") < col("r.print"))
      .select(col("l.print").as("pa"), col("r.print").as("pb"),
        TextOps.hamming(col("l.print"), col("r.print")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("pa", "pb")
    val cross = printPairs
      .join(clusters.as("ca"), col("pa") === col("ca.print"))
      .join(clusters.as("cb"), col("pb") === col("cb.print"))
      .select(col("hamming"), explode(col("ca.ids")).as("ia"), col("cb.ids"))
      .select(col("hamming"), col("ia"), explode(col("cb.ids")).as("ib"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
    val intra = clusters
      .where(size(col("ids")) > 1)
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id_a")))
      .select(col("id_a"),
        explode(slice(col("ids"), col("i") + lit(2), size(col("ids"))))
          .as("id_b"))
      .select(col("id_a"), col("id_b"), lit(0).cast("integer").as("hamming"))
    CacheScope.unpersistAfterAction(cross.unionByName(intra), Seq(clusters))
  }

  /**
   * MinHash near-duplicate REMOVAL: the corpus minus every row with a
   * LOWER-id near-duplicate (Jaccard ≥ `minJaccard`) — the keep-the-most-
   * canonical-copy rule, one anti-join over the LSH pair stream. Single
   * hop by design, exactly as [[embeddingCosine]]: no iterative
   * connected-components pass, a row survives unless a lower-id
   * near-duplicate of it exists.
   */
  def minHashKeep(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double,
      blockCol: Option[String] = None): DataFrame =
    minHashKeepFromPairs(df,
      idCol, minHashLshPairs(df, idCol, textCol, minJaccard, blockCol))

  /** [[minHashKeep]] over an ALREADY-COMPUTED verified pair stream — the
    * form a pipeline uses when several downstream rules (keep-first,
    * components, cluster-best) share one LSH pass: a single anti-join on
    * the higher pair ids, no signature recomputation. */
  def minHashKeepFromPairs(
      df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)), Seq(idCol), "left_anti")

  /**
   * Connected components over an undirected pair graph — the transitive-
   * closure step that turns near-duplicate PAIRS into duplicate CLUSTERS:
   * `a~b` and `b~c` put a, b, c in ONE component even when `a~c` was never
   * emitted (the one-hop keep rule of [[minHashKeep]] cannot see that).
   * Returns one row per node: (`idCol`, `component`) where `component` is
   * the smallest node id in the component — the canonical representative
   * to keep.
   *
   * Iterative min-label propagation WITH POINTER DOUBLING: each round every
   * node takes the min of its own label, its neighbors' labels, and — the
   * Shiloach–Vishkin short-cut — its LABEL'S label. The extra hop halves
   * label chains every round, so convergence needs O(log diameter) rounds,
   * not O(diameter): an adversarial path graph of diameter 2^maxIter still
   * converges, where plain propagation would hard-fail the fixpoint guard.
   * (Near-dup graphs are usually clique-ish — LSH emits clusters whose
   * members share band buckets, and byte-identical copies collapse
   * upstream — so typical inputs converge in 2-3 rounds either way; the
   * doubling is the guard for the adversarial long-chain tail.) Each round
   * shuffles (id, label) and (src, dst) rows ONLY — ids, never payloads —
   * as one shuffle join + one map-side-combined min aggregation + one
   * label-domain self-join, all on the same id domain. `localCheckpoint`
   * truncates lineage each round (the plan would otherwise double per
   * iteration), and the convergence check is a driver-bounded scalar count
   * riding the same materialization.
   */
  def connectedComponents(
      nodes: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    // materialize the pair stream ONCE before fanning out (symmetrization
    // reads it twice, and an expensive upstream like the LSH pipeline would
    // otherwise re-execute per reference — its operator-scoped caches
    // release after the FIRST action); multiplicity is harmless under min,
    // so no distinct
    val p0 = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .localCheckpoint()
    val edges = p0
      .unionByName(p0.select(col("dst").as("src"), col("src").as("dst")))
    val spark = nodes.sparkSession
    // Size the loop's shuffle width to the DUPLICATE SUBGRAPH, not the
    // session's corpus-scan width: every round pays per-task fixed costs
    // on two shuffles (join + min aggregation) times the diameter, over a
    // frame proportional to the number of near-duplicates — a skinny
    // (id, label) stream. One partition per ~100k edges keeps reducer
    // input in the tens of MB. The width is imposed with EXPLICIT
    // repartition(width, key) on every loop input — never by narrowing the
    // session's spark.sql.shuffle.partitions, which would silently throttle
    // any query another thread submits on the shared session during the
    // diameter×2 shuffles of the loop. The aggregate runs on the join
    // output already at the loop width (no combine across an extra
    // exchange); per-partition input is ~200k id-pairs by construction, so
    // the lost map-side combine is noise next to the per-task fixed costs
    // the narrow width exists to bound.
    val sessionWidth = spark.conf.get("spark.sql.shuffle.partitions").toLong
    val width = math.max(2L,
      math.min(sessionWidth, p0.count() / 100000L + 1L)).toInt
    val edgesW = edges.repartition(width, col("src")).localCheckpoint()
    var labels = nodes.select(col(idCol).as("__id"), col(idCol).as("component"))
      .repartition(width, col("__id"))
      .localCheckpoint()
    // convergence counts ride the checkpoint materialization itself as
    // OBSERVED metrics (CollectMetrics accumulators delivered on the same
    // action) — one driver round-trip per shuffle round instead of a
    // second count() job over each checkpointed frame; on a diameter-d
    // graph that halves the loop's action count
    def observedCheckpoint(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val ck = df.observe(obs, count(when(col("__chg"), lit(1))).as("chg"))
        .localCheckpoint()
      (ck, obs.get("chg").asInstanceOf[Long])
    }
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val inMin = edgesW
        .join(labels.select(col("__id").as("src"), col("component"))
          .repartition(width, col("src")), "src")
        .select(col("dst").as("__id"), col("component"))
        .repartition(width, col("__id"))
        .groupBy(col("__id"))
        .agg(min(col("component")).as("__in"))
      val (viaEdge, edgeChanged) = observedCheckpoint(
        labels.join(inMin, Seq("__id"), "left_outer")
          .select(col("__id"),
            least(col("component"), coalesce(col("__in"), col("component")))
              .as("component"),
            (coalesce(col("__in") < col("component"), lit(false))).as("__chg")))
      if (edgeChanged == 0) {
        // classic edge-hop fixpoint: no label moved in a full pass, so
        // labels are equal across every edge — constant per component and
        // already the component minima. The doubling hop would be a no-op
        // shuffle; skip it and stop here.
        changed = 0
        val prev = labels
        labels = viaEdge.drop("__chg")
        prev.unpersist()
      } else {
        // pointer doubling: follow my label to ITS label in the same round.
        // A label is always a node id of the same component, so the jump is
        // exact; labels only ever decrease toward the component minimum.
        val self = viaEdge
          .select(col("__id").as("__c"), col("component").as("__cc"))
          .repartition(width, col("__c"))
        val (next, nextChanged) = observedCheckpoint(viaEdge
          .repartition(width, col("component"))
          .join(self, col("component") === col("__c"), "left_outer")
          .select(col("__id"),
            least(col("component"), coalesce(col("__cc"), col("component")))
              .as("component"),
            (col("__chg") ||
              coalesce(col("__cc") < col("component"), lit(false))).as("__chg")))
        changed = nextChanged
        val prev = labels
        labels = next.drop("__chg")
        prev.unpersist()
        viaEdge.unpersist()
      }
      iter += 1
    }
    require(changed == 0,
      s"connectedComponents: no fixpoint after $maxIter rounds " +
        s"(pointer doubling converges in O(log diameter); this needs a " +
        s"component diameter around 2^$maxIter)")
    p0.unpersist()
    edgesW.unpersist()
    labels.withColumnRenamed("__id", idCol)
  }

  /**
   * Incremental transitive-duplicate maintenance — the cluster-index
   * release-over-release arm (the [[Graph.pagerankWarm]] posture applied
   * to components): merge a NEW batch of duplicate pairs into a prior
   * release's (id, label) table WITHOUT re-reading the accumulated pair
   * log. The prior labeling enters the propagation as STAR edges
   * (member → its component label): a label is always the id of a
   * member of the same component, so the stars preserve exactly the
   * prior connectivity, and duplicate pairs are only ever APPENDED
   * (a dedup pair log never retracts an observed duplication), so
   * min-label propagation over (stars ∪ new pairs) converges to the
   * SAME canonical min-id labels as a cold run over the full
   * accumulated log — the spec + oracle pin.
   *
   * Scale: the loop's frame is (prior members + new-pair members), with
   * every prior component contributing diameter 1 (a star) — rounds
   * track the NEW merges' diameter, not the accumulated graph's, and
   * the accumulated pair log (the expensive LSH output of every past
   * release) is never re-scanned.
   */
  def componentsMerge(
      prior: DataFrame,
      idCol: String,
      labelCol: String,
      newPairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val np = newPairs.select(col(aCol).as("id_a"), col(bCol).as("id_b"))
      .localCheckpoint()
    val stars = prior
      .select(col(idCol).as("id_a"), col(labelCol).as("id_b"))
      .where(col("id_a") =!= col("id_b")) // self-labels carry no edge
    val nodes = prior.select(col(idCol))
      .unionByName(np.select(col("id_a").as(idCol)))
      .unionByName(np.select(col("id_b").as(idCol)))
      .distinct()
    connectedComponents(nodes, idCol, stars.unionByName(np),
      "id_a", "id_b", maxIter)
  }

  /**
   * Transitive near-duplicate REMOVAL: keep exactly one document per
   * connected component of the pair graph (the component's minimum id) —
   * the closure of the one-hop [[minHashKeep]] rule: in a chain `a~b~c`
   * where `a~c` was never emitted, only `a` survives here, whereas the
   * one-hop rule would also keep `c`.
   *
   * Scale: the label-propagation iteration runs over the DUPLICATE
   * SUBGRAPH only — nodes appearing in at least one pair — which is
   * proportional to the number of near-duplicates, not corpus size; the
   * untouched remainder never enters the loop and survives the final
   * anti-join untouched (the drop-list is members whose component label
   * is another node's id, shuffled as bare ids).
   */
  def componentsKeep(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    // materialize the pair stream once: it feeds the member scan (twice)
    // and the propagation loop, and an expensive upstream (the LSH
    // pipeline) must not re-execute per reference
    val p = pairs.select(col(aCol), col(bCol)).localCheckpoint()
    val members = p.select(col(aCol).as(idCol))
      .unionByName(p.select(col(bCol).as(idCol)))
      .distinct()
    val drops = connectedComponents(members, idCol, p, aCol, bCol)
      .where(col("component") =!= col(idCol))
      .select(col(idCol))
    df.join(drops, Seq(idCol), "left_anti")
  }

  /**
   * Transitive near-duplicate removal keeping the BEST-scoring member of
   * each duplicate component (ties: lowest id) — the production variant of
   * [[componentsKeep]]: real pipelines keep the highest-quality copy of a
   * near-dup cluster (longest, cleanest, highest classifier score), not
   * the lowest id. `scoreCol` must be a column of `df`.
   *
   * Scale: identical iteration cost to [[componentsKeep]] (the label
   * propagation runs over the duplicate subgraph only); picking the winner
   * is one map-side-combinable `max_by` aggregate per component — never a
   * window over the component partition, so a pathological million-member
   * component combines map-side instead of funneling one task. Scores join
   * in for MEMBERS only (ids + one double), the untouched remainder never
   * shuffles.
   */
  def componentsKeepBest(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      pairs: DataFrame,
      aCol: String = "id_a",
      bCol: String = "id_b"): DataFrame = {
    val p = pairs.select(col(aCol), col(bCol)).localCheckpoint()
    val members = p.select(col(aCol).as(idCol))
      .unionByName(p.select(col(bCol).as(idCol)))
      .distinct()
    val comps = connectedComponents(members, idCol, p, aCol, bCol)
    // cached: (id, score, component) is duplicate-subgraph-sized and feeds
    // TWO consumers (the winner aggregate and the drops join) — without it
    // each consumer re-evaluates the score expression over the corpus join
    val scored = comps.join(df.select(col(idCol), col(scoreCol)), Seq(idCol))
      .cache()
    // winner per component: max (score, -id) — highest score, lowest id on
    // ties; max_by is partial-combinable, unlike a row_number window
    val keepers = scored.groupBy(col("component"))
      .agg(max_by(col(idCol), struct(col(scoreCol), -col(idCol)))
        .as("__keep"))
    val drops = scored
      .join(keepers, Seq("component"))
      .where(col(idCol) =!= col("__keep"))
      .select(col(idCol))
    CacheScope.unpersistAfterAction(
      df.join(drops, Seq(idCol), "left_anti"), Seq(scored))
  }

  /**
   * Incremental (batch-vs-prior-corpus) exact dedup: of the new `batch`,
   * keep only rows whose content digest appears neither in the already-
   * ingested `corpus` nor earlier (lowest `idCol` wins) within the batch
   * itself — the ingest-time dedup step of a continuously-crawled corpus.
   *
   * Scale: both sides reduce to 32-byte sha2 digests map-side before any
   * shuffle (the anti-join and the keep-first window both key on the
   * digest, so shuffle volume is O(rows), never O(corpus bytes)); at
   * 100 TB the `corpus` side is the maintained digest INDEX from prior
   * ingests — exactly the digest this operator keys on, persisted once
   * per ingest — not a rescan of prior text. That maintained index IS an
   * operator API: [[DedupIndex.writeDigestIndex]] /
   * [[DedupIndex.incrementalIndexed]] / [[DedupIndex.appendDigestIndex]]
   * (result pinned equal to this operator's; zero corpus-side Exchange).
   */
  def incremental(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      keyCol: String): DataFrame = {
    val kh = sha2(col(keyCol).cast("binary"), 256)
    // keep-first within the batch via min_by aggregate, NOT a row_number
    // window over the digest partition: a window partition can never be
    // split, so a 10M-copy boilerplate text would funnel every copy into
    // ONE task, while the aggregate's map-side partial ships one candidate
    // row per digest per mapper (same de-funnel as [[keepFirst]])
    val deduped = batch.withColumn("__kh", kh)
      .join(corpus.select(kh.as("__kh")), Seq("__kh"), "left_anti")
    deduped.groupBy(col("__kh"))
      .agg(min_by(struct(batch.columns.map(col): _*), col(idCol)).as("__row"))
      .select(col("__row.*"))
  }

  /**
   * [[incremental]] with a broadcast BLOOM-FILTER pre-gate over the corpus
   * digests — the shape that keeps ingest-time exact dedup cheap at 100 TB.
   *
   * The anti-join in [[incremental]] shuffles the WHOLE batch on the digest
   * even though (in a healthy crawl) only a small fraction of it collides
   * with the corpus. Here the corpus digest index folds once into a
   * digest-range-SHARDED Bloom filter bank (Spark's native
   * `BloomFilterAggregate` per shard, all shards in one aggregate job —
   * total bits sized by `expectedItems`/`fpp`, e.g. ~1.2 MB per 10⁶ items
   * at 1%), the bank broadcasts (torrent — fetched once per executor,
   * never inside a task binary), and every batch row tests its shard's
   * filter MAP-SIDE via the codegen'd `bloom_bank_contains`:
   *
   *  - definite misses (the overwhelming majority of new data) bypass the
   *    corpus join entirely — no shuffle, no corpus probe;
   *  - possible hits (true dups + the fpp sliver) are exact-confirmed by
   *    the [[incremental]] anti-join, so false positives cannot drop rows.
   *
   * Result is therefore EXACTLY [[incremental]]'s (the oracle pins that):
   * Bloom filters have no false negatives, and the exact confirm removes
   * the false positives. Only the confirm path — |true dups| + fpp·|batch|
   * rows — ever reaches the shuffle. In-batch keep-first still sees every
   * row, but via the same map-side-combinable min_by.
   */
  /** Hard cap on the bank's total bit-array bytes (1 GiB). Beyond it the
    * gate stops being the right tool — the fpp required to stay under the
    * cap decays toward 1 and the gate stops gating — so the operator fails
    * LOUDLY and points at the persisted digest index
    * ([[DedupIndex.writeDigestIndex]] + [[DedupIndex.incrementalIndexed]]),
    * which is the 10¹¹-document answer. */
  private[graft] val MaxBloomBankBytes: Long = 1L << 30

  /**
   * Fold the corpus's key digests into a digest-range-SHARDED Bloom filter
   * BANK (ONE aggregate job: `groupBy(hash mod shards)` builds all shard
   * filters in a single pass, each sized `expectedItems/shards`) and
   * return the map-side membership probe — a codegen'd
   * `bloom_bank_contains` over the broadcast bank, which picks the item's
   * shard from its hash and tests that filter only. Shared by the batch
   * ([[incrementalBloom]]) and streaming
   * ([[graft.streaming.Streams.incrementalDedupStream]]) ingest gates.
   *
   * Why a bank, not one bitmap: a single filter's bytes had to ship as a
   * LITERAL inside every task binary — ~1.2 GB at 10⁹ corpus docs / 1%
   * fpp, no torrent distribution, resent per task. The bank travels as a
   * normal broadcast (fetched once per executor), each shard filter is
   * individually bounded (`expectedItems/shards` capacity — the driver
   * never materializes more than the bank, and each aggregate partial
   * stays shard-sized), and the total is `require`-capped at
   * [[MaxBloomBankBytes]] with the persisted digest index named as the
   * beyond-cap design. Sharding by `floorMod(hash, shards)` partitions
   * items across filters, so the bank's aggregate fpp equals the single
   * filter's at the same total bits — results are IDENTICAL either way
   * (both designs are exact-confirmed downstream; the spec pins bank ≡
   * single-filter survivors).
   *
   * Returns None when the corpus contributed nothing (empty corpus — the
   * groupBy yields no shard rows): the correct degenerate gate is NO
   * gate. A shard with no corpus items stays null in the bank and probes
   * as a definite miss.
   */
  private[graft] def corpusBloomProbe(
      corpusDigests: Column,
      corpus: DataFrame,
      expectedItems: Long,
      fpp: Double,
      shards: Int = 64): Option[Column => Column] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.util.sketch.BloomFilter
    require(shards >= 1, "shards must be >= 1")
    require(BloomFilter.optimalNumOfBits(expectedItems, fpp) / 8 <= MaxBloomBankBytes,
      s"Bloom bank for expectedItems=$expectedItems at fpp=$fpp exceeds " +
        s"$MaxBloomBankBytes bytes; at this corpus cardinality the gate " +
        "stops gating — maintain a persisted digest index instead " +
        "(DedupIndex.writeDigestIndex / incrementalIndexed)")
    val perShard = math.max(1L, (expectedItems + shards - 1) / shards)
    val numBits = BloomFilter.optimalNumOfBits(perShard, fpp)
    val h = xxhash64(corpusDigests)
    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(h),
        Literal(perShard), Literal(numBits)).toAggregateExpression())
    val rows = corpus
      .groupBy(pmod(h, lit(shards.toLong)).cast("int").as("__shard"))
      .agg(bloomAgg.as("bf"))
      .collect()
    if (rows.isEmpty) None
    else {
      val bank = new Array[BloomFilter](shards)
      rows.foreach { r =>
        if (!r.isNullAt(1)) bank(r.getInt(0)) = BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bf")))
      }
      val bc = corpus.sparkSession.sparkContext.broadcast(bank)
      Some((digest: Column) => ColumnBridge.column(
        graft.plans.BloomBankContainsExpr(
          ColumnBridge.expression(xxhash64(digest)), bc, shards)))
    }
  }

  def incrementalBloom(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      keyCol: String,
      expectedItems: Long = 1000000L,
      fpp: Double = 0.01,
      shards: Int = 64): DataFrame = {
    val kh = sha2(col(keyCol).cast("binary"), 256)
    corpusBloomProbe(kh, corpus, expectedItems, fpp, shards) match {
      // empty corpus: nothing can collide — the gate degenerates to the
      // plain operator (which the result is pinned to equal anyway)
      case None => incremental(batch, corpus, idCol, keyCol)
      case Some(probe) =>
        val withDigest = batch.withColumn("__kh", kh)
        val mightContain = probe(col("__kh"))
        val misses = withDigest.where(!mightContain)
        val confirmed = withDigest.where(mightContain)
          .join(corpus.select(kh.as("__kh")), Seq("__kh"), "left_anti")
        misses.unionByName(confirmed)
          .groupBy(col("__kh"))
          .agg(min_by(struct(batch.columns.map(col): _*), col(idCol)).as("__row"))
          .select(col("__row.*"))
    }
  }

  /**
   * Incremental (batch-vs-corpus) NEAR-duplicate dedup — the ingest-batch
   * form of [[minHashKeep]], and the batch arbiter of the streaming
   * [[graft.streaming.Streams.minHashDedupStream]] ingest gate: of the
   * new `batch`, keep only documents that are near-duplicates of NOTHING
   * — neither of the already-ingested corpus (a shared band bucket AND
   * verified exact Jaccard ≥ `minJaccard`) nor of a lower-id batch
   * document (the within-batch keep-first rule).
   *
   * Scale shape: the batch side computes signatures map-side; the corpus
   * side joins as its (id, band, bucket) BAND INDEX plus an (id, shingle
   * set) verify table — both persisted once per ingest at 100 TB
   * (bucketed on the band bucket / id respectively), not a rescan of
   * prior text, exactly as [[incremental]]'s digest index. The bucket
   * equi-join carries ids only; shingle arrays travel only for the
   * candidate pairs that reach verification. The persisted form is
   * [[DedupIndex.writeBandIndex]] / [[DedupIndex.incrementalNearDupIndexed]]
   * / [[DedupIndex.appendBandIndex]] (result pinned equal to this
   * operator's; both index tables scan bucketed in place).
   */
  def incrementalNearDup(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double): DataFrame = {
    val bSig = withSignature(batch.select(col(idCol), col(textCol)),
      idCol, textCol).cache()
    val cSig = withSignature(corpus.select(col(idCol), col(textCol)),
      idCol, textCol).cache()
    val bBands = banded(bSig, idCol, Nil)
      .select(col("id").as("bid"), col("band"), col("bucket"))
      .where(col("bucket").isNotNull)
    val cBands = banded(cSig, idCol, Nil)
      .select(col("id").as("cid"), col("band"), col("bucket"))
      .where(col("bucket").isNotNull)
    val candidates = bBands.join(cBands, Seq("band", "bucket"))
      .select(col("bid"), col("cid")).dropDuplicates("bid", "cid")
    val corpusHits = candidates
      .join(bSig.select(col(idCol).as("bid"), col("shingles").as("bsh")), Seq("bid"))
      .join(cSig.select(col(idCol).as("cid"), col("shingles").as("csh")), Seq("cid"))
      .where(TextOps.jaccard(col("bsh"), col("csh")) >= minJaccard)
      .select(col("bid").as(idCol)).distinct()
    val result = minHashKeep(batch, idCol, textCol, minJaccard)
      .join(corpusHits, Seq(idCol), "left_anti")
    CacheScope.unpersistAfterAction(result, Seq(bSig, cSig))
  }

  /**
   * SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
   * embeddings cluster by nearest seed centroid, and within each cluster
   * any pair with cosine ≥ `minCosine` is a semantic duplicate — the
   * HIGHER id drops. Candidate generation is cluster-bounded: the
   * self-join shuffles by cluster id and compares members of the SAME
   * cluster only (the SemDeDup observation — semantic duplicates
   * co-locate under any reasonable clustering), so the comparison count
   * is sum-of-cluster-sizes-squared, never corpus-quadratic. Same
   * deterministic seed centroids as [[Similarity.ivfTopK]] (`nlist`
   * lowest-id vectors baked in as literals, assignment map-side); a
   * trained-k-means partitioner would swap in without changing the plan.
   */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      nlist: Int = 16): DataFrame = {
    val seeds = Similarity.collectSeeds(df, idCol, vecCol, nlist)
    val assigned = Similarity.assignClusters(df, idCol, vecCol, seeds)
    val drops = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.cid") < col("b.cid"))
      .where(graft.functions.VectorOps.cosine(col("a.cv"), col("b.cv"))
        >= minCosine)
      .select(col("b.cid").as("__drop"))
      .distinct()
    df.join(drops, col(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /**
   * [[semDedup]] over TRAINED k-means cells — the "trained partitioner
   * would swap in" seam, exercised: `k` L2 centroids from `iters` Lloyd
   * rounds ([[KMeans.train]] — exact integer micro-unit means, so the
   * trained partition is bit-identical cross-engine), assignment map-side
   * against the centroid literals, then the same cluster-bounded cosine
   * drop join. Trained cells track density, so cluster sizes — and with
   * them the sum-of-cluster-sizes-squared comparison cost — are far more
   * balanced than lowest-id seeds on a skewed corpus. Sizing: `k` should
   * grow ~√N with corpus size (SemDeDup's own regime) to keep mean cluster
   * size ~√N; the k×d training collect per round is centroid-sized, never
   * corpus-sized.
   */
  def semDedupTrained(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      k: Int,
      iters: Int): DataFrame = {
    val cents = KMeans.train(df, idCol, vecCol, k, iters)
    val assigned = KMeans.assign(df, idCol, vecCol, cents)
    val drops = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.cid") < col("b.cid"))
      .where(graft.functions.VectorOps.cosine(col("a.v"), col("b.v"))
        >= minCosine)
      .select(col("b.cid").as("__drop"))
      .distinct()
    df.join(drops, col(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /**
   * Incremental (batch-vs-corpus) SEMANTIC dedup — the SemDeDup form of
   * [[incrementalNearDup]], completing the incremental family (exact
   * digest / LSH near-dup / embedding cosine): of the new `batch`, keep
   * only vectors that are semantic duplicates of NOTHING — neither of the
   * already-ingested corpus (same cluster, cosine ≥ `minCosine`) nor of a
   * lower-id batch vector.
   *
   * The partitioner is the CORPUS's (the persisted cluster index of prior
   * ingests — seeds collected from the corpus, exactly the at-rest
   * `cluster`-partitioned layout [[Similarity.ivfTopK]] describes); the
   * batch assigns map-side against the same seed literals, so the
   * batch-corpus candidate join is cluster-equality — per batch vector,
   * ~1/nlist of the corpus, never all of it. The persisted form is
   * [[DedupIndex.writeClusterIndex]] /
   * [[DedupIndex.incrementalSemDedupIndexed]] /
   * [[DedupIndex.appendClusterIndex]] (result pinned equal to this
   * operator's; the cells table scans bucketed in place).
   */
  def incrementalSemDedup(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      nlist: Int = 16): DataFrame = {
    val seeds = Similarity.collectSeeds(corpus, idCol, vecCol, nlist)
    val bAssigned = Similarity.assignClusters(batch, idCol, vecCol, seeds)
    val cAssigned = Similarity.assignClusters(corpus, idCol, vecCol, seeds)
    val corpusHits = bAssigned.as("b")
      .join(cAssigned.as("c"), col("b.cluster") === col("c.cluster"))
      .where(graft.functions.VectorOps.cosine(col("b.cv"), col("c.cv"))
        >= minCosine)
      .select(col("b.cid").as("__drop"))
    val withinHits = bAssigned.as("a")
      .join(bAssigned.as("b"),
        col("a.cluster") === col("b.cluster") && col("a.cid") < col("b.cid"))
      .where(graft.functions.VectorOps.cosine(col("a.cv"), col("b.cv"))
        >= minCosine)
      .select(col("b.cid").as("__drop"))
    val drops = corpusHits.unionByName(withinHits).distinct()
    batch.join(drops, col(idCol).cast("long") === col("__drop"), "left_anti")
  }

  /**
   * n-gram Jaccard near-dup pairs: exact word-shingle Jaccard over
   * MinHash-LSH candidates, optionally restricted to a blocking key. This
   * replaces (and deliberately does not offer) the naive blocked self-join:
   * with a low-cardinality block key that plan is near-all-pairs —
   * quadratic in block size — while LSH candidates keep the pair count
   * proportional to the number of true near-duplicates.
   */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      minJaccard: Double): DataFrame =
    minHashLshPairs(df, idCol, textCol, minJaccard, Some(blockCol))

  /**
   * Embedding-cosine near-duplicate removal: candidate pairs come from
   * SRP-LSH ([[Similarity.lshNeighborPairs]]), verified by exact cosine ≥
   * `minCosine`; of each near-dup pair the HIGHER id drops (keep the most
   * canonical copy). One hop, deliberately not transitive closure: a row
   * survives unless a LOWER-id near-duplicate of it exists — the usual
   * pipeline rule, and a single anti-join instead of an iterative
   * connected-components pass.
   */
  def embeddingCosine(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double,
      bits: Int = 12,
      numTables: Int = 4): DataFrame =
    df.join(
      Similarity.lshNeighborPairs(df, idCol, vecCol, bits, minCosine, numTables)
        .select(col("id_b").as(idCol)),
      Seq(idCol), "left_anti")

  /** Variant of [[exact]] keeping the full first row per duplicate group
    * (grouping on the content digest, as [[exact]]). Deliberately ONE
    * `min_by(row, id)` aggregate rather than a `row_number` window over
    * the digest partition: a window partition can never be split, so a
    * 10M-copy boilerplate text would funnel every copy into ONE task —
    * while the aggregate's map-side partial keeps a single candidate row
    * per digest per task, so that text ships one row per mapper however
    * many copies exist. One scan, no join. Winner identical (lowest id
    * per digest; `idCol` unique is the caller's contract either way). */
  def keepFirst(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.groupBy(sha2(col(keyCol).cast("binary"), 256).as("__kh"))
      .agg(min_by(struct(df.columns.map(col): _*), col(idCol)).as("__row"))
      .select(col("__row.*"))

  /**
   * Shingle-set Jaccard similarity join with PREFIX FILTERING (the SSJoin /
   * AllPairs family: Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07) — an
   * EXACT similarity join, unlike the probabilistic MinHash-LSH candidates:
   * every pair with Jaccard ≥ `minJaccard` over distinct word-3-shingle
   * sets is guaranteed found.
   *
   * Completeness argument: order each document's distinct shingles by a
   * global total order (document frequency ascending, shingle hash
   * tie-break — rarest first). If J(a,b) ≥ t then the overlap exceeds
   * |a| − ⌈t·|a|⌉, so a and b must share at least one shingle within the
   * first |d| − ⌈t·|d|⌉ + 1 shingles of EACH document's ordering (for the
   * size bound, J ≥ t forces |b| ≥ t·|a|). Joining only on those prefix
   * shingles therefore misses nothing, while the rarest-first order makes
   * each join bucket's cardinality the shingle's document frequency — the
   * smallest buckets the data allows, which is what keeps the candidate
   * count near the true-pair count instead of quadratic.
   *
   * Plan shape (shuffle-conscious): one shingle-vocabulary aggregate for
   * document frequencies, one equi-join to attach them (shingle-keyed
   * shuffle), one per-document window to rank, a prefix-only self-join
   * carrying (shingle, id) pairs, then exact verification on the candidate
   * set — candidates join the (id → shingle-set) table twice and the full
   * Jaccard is computed with set intersection, so false positives die
   * here. At corpus scale every stage's width is ids+8-byte hashes; the
   * shingle arrays only travel for the verified candidates.
   */
  def jaccardPrefixPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minJaccard: Double): DataFrame = {
    // cached: the shingle-set table feeds the prefix stream AND both
    // verification joins — uncached, the tokenize→hash→shingle pipeline
    // (the plan's dominant CPU) would re-execute three times
    val sets = df
      .select(col(idCol).as("doc_id"),
        array_sort(array_distinct(TextOps.shingleHashes(
          TextOps.tokenHashes(TextOps.tokens(col(textCol)))))).as("ts"))
      .where(size(col("ts")) > 0)
      .cache()
    val toks = sets.select(col("doc_id"), size(col("ts")).as("m"),
      explode(col("ts")).as("tok"))
    val docFreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val prefix = toks.join(docFreq, Seq("tok"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("tok"))))
      .where(col("rnk") <= col("m") - ceil(lit(minJaccard) * col("m")) + 1)
      .select(col("tok"), col("doc_id"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // ts is array_sort'ed above precisely so the per-PAIR verify can be the
    // native zero-allocation merge walk instead of a hash-set intersect —
    // candidate pairs scale with the corpus, the sort is once per row
    val inter = TextOps.sortedIntersectCount(col("ts_a"), col("ts_b"))
    val jac = inter.cast("double") /
      (size(col("ts_a")) + size(col("ts_b")) - inter).cast("double")
    val verified = cand
      .join(sets.select(col("doc_id").as("id_a"), col("ts").as("ts_a")), Seq("id_a"))
      .join(sets.select(col("doc_id").as("id_b"), col("ts").as("ts_b")), Seq("id_b"))
      .withColumn("jaccard", jac)
      .where(col("jaccard") >= lit(minJaccard))
      .select(col("id_a"), col("id_b"), col("jaccard"))
    CacheScope.unpersistAfterAction(verified, Seq(sets))
  }

  /**
   * Repeated-span detection (the repeated-substring dedup family of
   * Lee et al. 2022, arXiv:2107.06499): every (document, token offset)
   * whose `n`-token window also occurs in ANOTHER document — the spans a
   * repeated-substring pass excises. Returns (`idCol`, pos).
   *
   * Skew-safe shape: hot windows come from a `groupBy(wh)` aggregate —
   * map-side partial combine collapses each task's occurrences of a hash
   * to ONE row before the shuffle, so a boilerplate window occurring in
   * millions of documents costs its reducer one row per upstream task,
   * not one per occurrence. The occurrence stream then semi-joins the hot
   * set back on `wh`: a skewed JOIN partition can be split by AQE (and a
   * small hot set broadcasts, removing the probe shuffle entirely),
   * whereas the previous windowed min/max OVER the raw hash partition
   * funneled every occurrence of a hot hash into one unsplittable task.
   * The price is a second evaluation of the tokenize→hash→shingle chain
   * for the aggregate side — map-parallel CPU, which scales out; the
   * funnel did not.
   */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int): DataFrame = {
    def windows = docs.select(col(idCol),
      posexplode(TextOps.shingleHashes(
        TextOps.tokenHashes(TextOps.tokens(col(textCol))), n))
        .as(Seq("pos", "wh")))
    val hot = windows
      .groupBy(col("wh"))
      .agg(min(col(idCol)).as("__mn"), max(col(idCol)).as("__mx"))
      .where(col("__mn") =!= col("__mx"))
      .select(col("wh"))
    windows.join(hot, Seq("wh"), "left_semi")
      .select(col(idCol), col("pos"))
  }

  /** Reassemble documents from surviving (`__id`, `__pos`, `__line`) rows:
    * one doc-keyed aggregate, lines rejoined in position order. Documents
    * with no surviving lines drop (the groupBy never sees them). */
  private[operators] def reassemble(kept: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    kept.groupBy(col("__id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          x => x.getField("__line")),
        sep).as(textCol))
      .select(col("__id").as(idCol), col(textCol))

  /** (`__id`, `__pos`, `__line`, `__kh`) — one row per paragraph, keyed by
    * the 256-bit content digest so every downstream shuffle carries 32
    * bytes + ids, never the paragraph text. */
  private[operators] def paragraphs(df: DataFrame, idCol: String, textCol: String,
      sep: String): DataFrame =
    df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__kh", sha2(col("__line").cast("binary"), 256))

  /**
   * Paragraph-level exact deduplication — the line-dedup stage of C4 /
   * RefinedWeb-style corpus preparation (Raffel et al. 2020,
   * arXiv:1910.10683 §2.2 "three-sentence span" dedup; Penedo et al. 2023,
   * arXiv:2306.01116 §4.2): documents split on `sep` into paragraphs,
   * every paragraph whose exact content already occurred at a lower
   * (document id, position) ANYWHERE in the corpus is removed, and each
   * document is reassembled from its surviving paragraphs in their
   * original order. Documents left with no paragraphs drop entirely.
   *
   * Scale shape: paragraphs shuffle by their sha2-256 digest (32 bytes +
   * ids per row), and the global first occurrence per digest is a
   * map-side-combinable `groupBy(digest).min` aggregate joined back on the
   * digest — deliberately NOT a window over the digest partition: a
   * boilerplate paragraph occurring in millions of documents would funnel
   * every occurrence into one unsplittable window task, while the
   * aggregate collapses them map-side and the join-back's skewed
   * partition is AQE-splittable (same lesson as [[repeatedSpans]]).
   * Reassembly is one doc-keyed aggregate; paragraph text travels only
   * from its original row to its reassembly group.
   */
  def paragraphDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = paragraphs(df, idCol, textCol, sep)
    val firsts = lines.groupBy(col("__kh"))
      .agg(min(struct(col("__id"), col("__pos"))).as("__first"))
    val kept = lines.join(firsts, Seq("__kh"))
      .where(col("__first.__id") === col("__id") &&
        col("__first.__pos") === col("__pos"))
      .select(col("__id"), col("__pos"), col("__line"))
    reassemble(kept, idCol, textCol, sep)
  }

  /**
   * Boilerplate-paragraph removal: every paragraph whose exact content
   * occurs in at least `minDocs` DISTINCT documents is removed from ALL of
   * them (headers, navigation chrome, license blocks — the "remove every
   * copy" policy, vs [[paragraphDedup]]'s keep-first), and documents are
   * reassembled from what remains. The hot set is a digest-keyed
   * `count(distinct doc)` aggregate; the occurrence stream anti-joins it
   * on the digest (broadcastable when the boilerplate vocabulary is small,
   * AQE-splittable when a digest is hot — never a window funnel).
   */
  def boilerplateStrip(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
      sep: String = "\n"): DataFrame = {
    val lines = paragraphs(df, idCol, textCol, sep)
    val hot = lines.groupBy(col("__kh"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__kh"))
    val kept = lines.join(hot, Seq("__kh"), "left_anti")
      .select(col("__id"), col("__pos"), col("__line"))
    reassemble(kept, idCol, textCol, sep)
  }

  /**
   * Two-stage near-duplicate confirmation: MinHash-LSH proposes candidate
   * pairs, EXACT normalized edit similarity verifies them — the standard
   * candidate→verify architecture (the LSH stage bounds the quadratic
   * edit-distance work to the shortlist; edit distance is the verifier
   * shingle-Jaccard cannot be, since it sees transpositions and
   * in-shingle character noise that shingling blurs).
   *
   * `edit_sim = 1 − lev(a, b) / max(len(a), len(b))` — 1.0 for identical
   * texts, 0.0 when every character differs. Pairs keep iff
   * `edit_sim ≥ minSim`.
   *
   * Scale shape for a 100 TB corpus:
   *  - the O(L²)-per-pair Levenshtein runs ONLY on LSH-shortlisted pairs —
   *    never corpus × corpus;
   *  - the candidate relation carries only (id_a, id_b) until the verify
   *    join; text ships solely for ids that appear in some pair (one
   *    explode + distinct yields the shortlist ids, a semi-join prunes the
   *    corpus to them BEFORE any wide join);
   *  - `levenshtein` is a codegen'd binary expression — the verify stage
   *    stays inside whole-stage codegen.
   *
   * NOTE: Spark's `levenshtein` counts CHARACTERS. Engines that count
   * bytes (e.g. DuckDB) agree only on ASCII text; the per-char contract
   * is pinned by the ScalaTest spec, the oracle runs on ASCII data.
   */
  def editConfirmPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minSim: Double = 0.8,
      minJaccard: Double = 0.0,
      blockCol: Option[String] = None,
      maxBucket: Option[Int] = None): DataFrame = {
    // cached: the candidate subplan (the full LSH band-join pipeline) is
    // consumed twice — once as the verify join's base and once to derive
    // the shortlist ids — and without the cache the dominant stage would
    // execute twice per action
    val cand = minHashLshPairs(df, idCol, textCol, minJaccard, blockCol,
        maxBucket)
      .select(col("id_a"), col("id_b"))
      .cache()
    val ids = cand.select(explode(array(col("id_a"), col("id_b"))).as("__id"))
      .distinct()
    val texts = df.select(col(idCol).as("__id"), col(textCol).as("__t"))
      .join(ids, Seq("__id"), "left_semi")
    val verified = cand
      .join(texts.select(col("__id").as("id_a"), col("__t").as("__ta")),
        Seq("id_a"))
      .join(texts.select(col("__id").as("id_b"), col("__t").as("__tb")),
        Seq("id_b"))
      .withColumn("lev", levenshtein(col("__ta"), col("__tb")).cast("long"))
      .withColumn("edit_sim",
        // floor-1 denominator: a pair of empty texts (reachable through a
        // future candidate source, even though minHashLshPairs never pairs
        // empty-shingle texts) scores lev=0 / 1 = edit_sim 1.0 — the
        // correct identical-texts verdict — instead of 0/0 (NULL, or an
        // ANSI divide error)
        round(lit(1.0) - col("lev").cast("double") /
          greatest(length(col("__ta")), length(col("__tb")), lit(1))
            .cast("double"), 6))
      .where(col("edit_sim") >= minSim)
    CacheScope.unpersistAfterAction(
      verified.select(col("id_a"), col("id_b"), col("lev"), col("edit_sim")),
      Seq(cand))
  }

  /**
   * Host-scoped template-line detection — the navigation/chrome filter of
   * CCNet-style crawl curation (Wenzek et al. 2020, arXiv:1911.00359 §3.1
   * dedups lines against their shard; real crawl pipelines scope the rule
   * to the HOST because nav chrome repeats within a site): a line counting
   * as template iff it occurs in at least `minDocs` DISTINCT documents of
   * the SAME host. A line popular across many hosts but appearing once
   * per host (a famous quote) is NOT template — the discriminator vs the
   * corpus-global [[boilerplateStrip]].
   *
   * Returns one row per (host, template line): (`hostCol`, `line`,
   * `n_docs`). Scale shape: lines shuffle by (host, 256-bit digest) — 32
   * bytes + keys per row, map-side combinable `count(distinct doc)`; the
   * digest→text resolution joins back only the TEMPLATE digests (the hot
   * set is tiny — per-host nav vocabularies, broadcastable).
   */
  def hostTemplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      hostCol: String,
      minDocs: Int,
      sep: String = "\n"): DataFrame = {
    val lines = hostParagraphs(df, idCol, textCol, hostCol, sep)
    val hot = lines.groupBy(col("__host"), col("__kh"))
      .agg(countDistinct(col("__id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
    // resolve digest → line text from ONE representative occurrence (the
    // min (id, pos) one) so the output is deterministic and the join-back
    // right side is only the hot digests
    val rep = lines.join(broadcast(hot.select(col("__host"), col("__kh"))),
        Seq("__host", "__kh"), "left_semi")
      .groupBy(col("__host"), col("__kh"))
      .agg(min(struct(col("__id"), col("__pos"), col("__line"))).as("__f"))
      .select(col("__host"), col("__kh"), col("__f.__line").as("line"))
    hot.join(rep, Seq("__host", "__kh"))
      .select(col("__host").as(hostCol), col("line"), col("n_docs"))
  }

  /** Remove every host-template line (per [[hostTemplateLines]]'s rule)
    * from every document of that host and reassemble; documents reduced to
    * nothing drop. The anti-join runs on (host, digest) — the hot side is
    * the per-host template vocabulary, broadcastable. */
  def hostTemplateStrip(
      df: DataFrame,
      idCol: String,
      textCol: String,
      hostCol: String,
      minDocs: Int,
      sep: String = "\n"): DataFrame = {
    val lines = hostParagraphs(df, idCol, textCol, hostCol, sep)
    val hot = lines.groupBy(col("__host"), col("__kh"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__host"), col("__kh"))
    val kept = lines.join(broadcast(hot), Seq("__host", "__kh"), "left_anti")
      .select(col("__id"), col("__pos"), col("__line"))
    reassemble(kept, idCol, textCol, sep)
  }

  /**
   * Soft deduplication: keep EVERY row, downweight duplicates to
   * `1 / n_copies` — the loss-weighting alternative to dropping (total
   * gradient mass per distinct text stays 1, so boilerplate stops
   * dominating the objective without discarding provenance or the
   * ability to re-decide later; the "soft dedup" option discussed in
   * SemDeDup-era ablations). Scale shape: counts are one digest-keyed
   * map-side-combinable aggregate joined back on the 32-byte digest
   * (broadcastable when few texts duplicate, AQE-splittable when one is
   * hot — never a window). Returns (`idCol`, `n_copies`, `weight`).
   */
  def softWeights(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    // null keys digest to a sentinel instead of null: sha2(null) is null,
    // null never equi-joins, and the keep-EVERY-row contract would
    // silently lose null-text rows — they form their own duplicate class
    // (null == null dedup semantics) and carry a weight like everyone else
    val kh = coalesce(sha2(col(keyCol).cast("binary"), 256), lit("__null__"))
    val keyed = df.select(col(idCol), kh.as("__kh"))
    val counts = keyed.groupBy(col("__kh"))
      .agg(count(lit(1)).as("n_copies"))
    keyed.join(counts, Seq("__kh"))
      .select(col(idCol), col("n_copies"),
        round(lit(1.0) / col("n_copies").cast("double"), 6).as("weight"))
  }

  /**
   * Mirror-host detection: host pairs whose CONTENT-DIGEST sets overlap
   * with Jaccard ≥ `minJaccard` — the site-mirror filter of crawl curation
   * (a corpus that keeps both `ftp.gnu.org` and its 40 mirrors pays 41×
   * for the same text; UbiCrawler / IRLbot-family pipelines drop mirrors
   * at the HOST level before document-level dedup ever runs).
   *
   * Scale shape:
   *  - per-host set sizes are one map-side-combinable
   *    `count(distinct digest)` aggregate;
   *  - candidate pairs come from co-occurrence on a SHARED digest — the
   *    digest→hosts relation, self-joined per digest. A digest carried by
   *    thousands of hosts (a boilerplate page: "403 Forbidden") would
   *    expand quadratically, so digests on more than `maxHostsPerDigest`
   *    DISTINCT hosts are dropped from pairing first (they are evidence of
   *    boilerplate, not mirroring; the cap is the same hard bound as
   *    [[minHashLshPairs]]'s `maxBucket`);
   *  - shared counts aggregate on (host_a, host_b) — map-side combinable —
   *    and the per-host sizes broadcast back (host cardinality ≪ corpus).
   *
   * Returns (`host_a`, `host_b`, `n_shared`, `jaccard`), host_a < host_b.
   */
  def hostMirrorPairs(
      df: DataFrame,
      hostCol: String,
      textCol: String,
      minJaccard: Double,
      maxHostsPerDigest: Int = 256): DataFrame = {
    val hd = df.select(col(hostCol).as("__host"),
        sha2(col(textCol).cast("binary"), 256).as("__kh"))
      .distinct()
    val sizes = hd.groupBy(col("__host"))
      .agg(count(lit(1)).as("__n"))
    val pairable = hd.withColumn("__nh",
        count(lit(1)).over(Window.partitionBy(col("__kh"))))
      .where(col("__nh") <= maxHostsPerDigest)
    val shared = pairable.as("l").join(pairable.as("r"),
        col("l.__kh") === col("r.__kh") && col("l.__host") < col("r.__host"))
      .groupBy(col("l.__host").as("host_a"), col("r.__host").as("host_b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.select(col("__host").as("host_a"),
        col("__n").as("__na"))), Seq("host_a"))
      .join(broadcast(sizes.select(col("__host").as("host_b"),
        col("__n").as("__nb"))), Seq("host_b"))
      .withColumn("jaccard", round(col("n_shared").cast("double") /
        (col("__na") + col("__nb") - col("n_shared")).cast("double"), 6))
      .where(col("jaccard") >= minJaccard)
      .select(col("host_a"), col("host_b"), col("n_shared"), col("jaccard"))
  }

  /** [[paragraphs]] with the host key carried alongside each line. */
  private def hostParagraphs(df: DataFrame, idCol: String, textCol: String,
      hostCol: String, sep: String): DataFrame =
    df.select(col(idCol).as("__id"), col(hostCol).as("__host"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__kh", sha2(col("__line").cast("binary"), 256))
}
