package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / split assignment for training-data pipelines.
 *
 * Everything keys off a 16-bit multiplicative hash of the row id
 * ([[Sampling.hash16]]): Fibonacci-multiplier mixing rounds whose
 * intermediate products stay far below 2^63, so the SAME integer arithmetic
 * runs as a Spark `Column` expression and as ANSI SQL in the DuckDB oracle
 * ([[SamplingSql]]) — no RNG, no engine-specific hash builtin, and a row's
 * assignment never changes when the corpus grows (the property a 100 TB
 * pipeline needs: re-running a split after ingesting new data must not
 * reshuffle existing rows between train and test).
 *
 * Both operators are MAP-SIDE projections — the hash is codegen'd integer
 * arithmetic per row, there is no shuffle and no driver round-trip; at rest
 * the assigned frame would be written `partitionBy("split")`.
 */
object Sampling {

  /** Hash bucket count; assignments are fractions of this. */
  val Buckets = 65536L

  private[operators] val Mult = 40503L // 16-bit golden-ratio (Fibonacci) multiplier
  private[operators] val M32 = 4294967296L // 2^32: the mixing-state modulus

  /** Seed-derived odd multiplier for round 1 — the seed must interact
    * MULTIPLICATIVELY with the id: a purely additive seed shifts the whole
    * hash nearly affinely (measured: two 10% samples at seeds 0/1 overlapped
    * 37% instead of the independent 1%). Odd and < 2^17, so round-1's
    * product stays under 2^49. */
  private[operators] def seedMult(seed: Long): Long =
    Mult + 2L * math.floorMod(seed * Mult + 14029L, 32768L)

  /**
   * Mixed 16-bit hash of a non-negative integral id into [0, 65536), as
   * three multiply-fold rounds over 32-bit state. Every round folds the
   * state's HIGH half back into the product (`x % 65536 * mult + x >> 16`),
   * so no output bit is an affine function of the id — the previous
   * two-round variant kept `h ≡ const (mod 2)` for every id (the low bit
   * cancelled), which left half of [[shuffleAssign]]'s `pmod` buckets EMPTY.
   * Measured on ids 0..65535: every `mod 8` bucket within ±12 of uniform,
   * low bit balanced, and same-rate samples at different seeds overlap at
   * the independent expectation.
   *
   * Max intermediate: (2^32)·seedMult + (id >> 32) + const < 2^50 —
   * overflow-safe in any 64-bit engine, including DuckDB's overflow-checked
   * BIGINT (a 32-bit multiplier on a raw id would overflow once ids pass
   * ~2^31, which a 100 TB corpus does; hence the `% 2^32` pre-fold and the
   * explicit `id >> 32` high-half injection, so ids above 2^32 still
   * disperse). Shifts stand in for division — exact on non-negative longs
   * and rendered identically by DuckDB's `>>`.
   */
  def hash16(id: Column, seed: Long = 0L): Column = {
    require(seed >= 0L, "seed must be non-negative (SQL % is not pmod)")
    val a = pmod(
      pmod(id, lit(M32)) * lit(seedMult(seed)) + shiftright(id, 32) +
        lit(14029L + seed),
      lit(M32))
    val b = pmod(pmod(a, lit(Buckets)) * lit(Mult) + shiftright(a, 16), lit(M32))
    pmod(pmod(b, lit(Buckets)) * lit(Mult) + shiftright(b, 16), lit(Buckets))
  }

  /**
   * Quality-weighted Bernoulli selection (the DCLM/quality-upsampling
   * rule): keep each row independently with probability equal to its
   * `score` (a per-row column in [0, 1] — e.g.
   * [[graft.functions.QualityOps.qualityScore]]), decided by the portable
   * 16-bit hash — deterministic, seed-stable, exactly reproducible from
   * (id, score) alone, and a pure MAP-SIDE predicate: the selection
   * streams at scan speed like every other thinning here. A hard
   * `score >= τ` gate keeps cliff effects; probabilistic thinning keeps
   * the quality GRADIENT — high-quality docs survive proportionally more
   * often without a sharp cutoff.
   */
  def byQuality(
      df: DataFrame,
      idCol: String,
      score: Column,
      seed: Long = 0L): DataFrame =
    df.where(hash16(col(idCol), seed) <
      floor(score * lit(Buckets.toDouble)).cast("long"))

  /**
   * Assign every row to one named split (e.g. train/val/test) by hash
   * bucket: fractions map to contiguous bucket ranges, so the assignment is
   * deterministic, seed-stable, and exactly reproducible from the id alone.
   * Fractions must sum to ≤ 1; any remainder falls into the LAST split.
   */
  def assignSplit(
      df: DataFrame,
      idCol: String,
      splits: Seq[(String, Double)],
      seed: Long = 0L): DataFrame = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split fractions must sum to <= 1")
    val h = hash16(col(idCol), seed)
    // cumulative upper bounds; last split absorbs rounding remainder
    val bounds = splits.init.scanLeft(0L) { case (acc, (_, frac)) =>
      acc + math.round(frac * Buckets)
    }.tail
    val label = splits.init.zip(bounds).foldRight(
        lit(splits.last._1): Column) { case (((name, _), bound), onward) =>
      when(h < lit(bound), lit(name)).otherwise(onward)
    }
    df.withColumn("split", label)
  }

  /**
   * Deterministic rate-sample: keep a row iff its hash bucket falls under
   * `rate`. With the hash independent of `strataCol`, each stratum is
   * sampled at the same rate (proportional / stratified-by-construction);
   * different seeds draw disjoint-ish independent samples.
   */
  def sampleByHash(
      df: DataFrame,
      idCol: String,
      rate: Double,
      seed: Long = 0L): DataFrame = {
    require(rate >= 0 && rate <= 1, "rate in [0,1]")
    df.where(hash16(col(idCol), seed) < lit(math.round(rate * Buckets)))
  }

  /**
   * Deterministic global shuffle for training order: every row gets a
   * pseudo-random but id-reproducible (shuffle_bucket, shuffle_key) pair.
   * Writing `partitionBy("shuffle_bucket")` with `sortWithinPartitions
   * (shuffle_key, id)` materializes the permutation WITHOUT a global
   * total-order sort — readers stream buckets in bucket order and each
   * bucket is internally ordered, which is how a 100 TB corpus gets
   * shuffled: no single-partition `row_number` window, no driver
   * involvement, one hash-partition exchange at most.
   */
  def shuffleAssign(
      df: DataFrame,
      idCol: String,
      nBuckets: Int,
      seed: Long = 0L): DataFrame = {
    require(nBuckets > 0, "need at least one bucket")
    val key = hash16(col(idCol), seed)
    df.withColumn("shuffle_key", key)
      .withColumn("shuffle_bucket", pmod(key, lit(nBuckets.toLong)))
  }

  /**
   * Offset-based greedy sequence packing: within each `groupCol` shard,
   * documents are laid end-to-end in `orderCol` order and cut into
   * fixed-`budget` token sequences. Each document is assigned the sequence
   * its FIRST token lands in (`seq_id`) plus its starting offset there
   * (`tok_offset`); a document straddling a boundary continues into the
   * next sequence — the standard packed-pretraining layout where sequences
   * are filled without padding.
   *
   * The running total is a window sum PARTITIONED BY the shard column, so
   * packing parallelizes across shards (one shuffle by shard key, no global
   * sort) — exactly how a 100 TB corpus is packed: per input shard, after
   * [[shuffleAssign]] has randomized shard contents.
   */
  def packSequences(
      df: DataFrame,
      groupCol: String,
      orderCol: String,
      nTokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumBefore = sum(col(nTokensCol)).over(w) - col(nTokensCol)
    df.withColumn("seq_id", floor(cumBefore / lit(budget)))
      .withColumn("tok_offset", cumBefore % lit(budget))
  }

  /**
   * Best-fit-decreasing WHOLE-DOCUMENT packing — the truncation-free
   * alternative to [[packSequences]]'s concat-and-split layout (Ding et
   * al. 2024, "Fewer Truncations Improve Language Modeling",
   * arXiv:2404.10830 — their Best-fit Packing): a document is never
   * split across training sequences mid-stream; instead documents
   * longer than `seqLen` pre-split into ⌈n/seqLen⌉ PIECES (full-length
   * pieces plus one remainder — the paper's split-then-pack
   * arrangement, so nothing drops), and pieces bin-pack into
   * fixed-capacity sequences by best-fit over the length-descending
   * order: each piece lands in the open sequence with the SMALLEST
   * remaining capacity that still fits it (ties → lowest sequence id),
   * or opens a new sequence. Unfilled capacity is PADDING, not another
   * document's truncated head — the attention mask never crosses a
   * document boundary and no document loses its tail.
   *
   * Spark geometry, stated honestly: bin packing is inherently
   * sequential, so the GROUP (shard) is the parallel unit — one
   * `repartition(group)` + in-partition sort by (len desc, id, piece),
   * then one `mapPartitions` pass holding only the group's OPEN-BIN
   * tree (≤ bins-per-group entries — bounded by the group's token
   * volume over `seqLen`; size groups to executors the way the paper
   * packs within bounded corpus chunks). Deterministic: the order and
   * the tie rule fix every placement. BFD's classic guarantee bounds
   * the output: sequences used ≤ (11·OPT + 6)/9 (Johnson 1973), with
   * OPT ≥ ⌈total/seqLen⌉ — the `pack_bestfit` gate checks that bound
   * corpus-wide.
   *
   * Returns (groupCol string-cast, idCol long-cast, piece, len, seq_id,
   * offset): piece = the document's split index (0 for unsplit docs),
   * offset = the piece's first token position inside its sequence.
   */
  def packBestFit(
      df: DataFrame, groupCol: String, idCol: String,
      nTokensCol: String, seqLen: Int): DataFrame = {
    require(seqLen > 0, "packBestFit: seqLen must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val pieces = df
      .select(col(groupCol).cast("string").as("g"),
        col(idCol).cast("long").as("id"),
        col(nTokensCol).cast("long").as("n"))
      .where(col("n") > 0)
      .select(col("g"), col("id"),
        explode(sequence(lit(0L), expr(s"(n - 1) div ${seqLen}L")))
          .as("piece"), col("n"))
      .select(col("g"), col("id"), col("piece").cast("int").as("piece"),
        least(col("n") - col("piece") * seqLen, lit(seqLen.toLong))
          .cast("int").as("len"))
    pieces.as[(String, Long, Int, Int)]
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("len").desc, col("id"),
        col("piece"))
      .mapPartitions { it =>
        var curG: String = null
        // open bins as (remaining, binId) — minAfter((len, MinValue))
        // IS the best-fit rule: smallest remaining ≥ len, tie lowest id
        var bins: scala.collection.mutable.TreeSet[(Int, Long)] = null
        var nextBin = 0L
        it.map { case (g, id, piece, len) =>
          if (g != curG) {
            curG = g
            bins = scala.collection.mutable.TreeSet.empty[(Int, Long)]
            nextBin = 0L
          }
          bins.minAfter((len, Long.MinValue)) match {
            case Some(hit @ (rem, bid)) =>
              bins.remove(hit)
              bins.add((rem - len, bid))
              (g, id, piece, len, bid, seqLen - rem)
            case None =>
              val bid = nextBin
              nextBin += 1
              bins.add((seqLen - len, bid))
              (g, id, piece, len, bid, 0)
          }
        }
      }
      .toDF(groupCol, idCol, "piece", "len", "seq_id", "offset")
  }

  /**
   * The Efraimidis–Spirakis exponential sort key for WEIGHTED sampling
   * without replacement (Efraimidis & Spirakis 2006, "Weighted random
   * sampling with a reservoir", IPL 97): keeping the k items with the
   * SMALLEST e_i = −ln(u_i)/w_i draws a weighted sample without
   * replacement exactly as sequential draws proportional to weight would.
   * u_i derives from the portable 16-bit row hash (deterministic,
   * seed-switchable, u ∈ (0,1)); the key ROUNDS to 9 decimals before any
   * ranking so a last-ulp `ln` divergence between engines cannot flip a
   * cut (the bm25/DSIR house rule), with id tie-breaks.
   *
   * CONTRACT: weights must be non-negative and non-null. A negative
   * weight yields a negative key that ALWAYS wins — silently inverting
   * the sampling bias — so [[weightedKPerGroup]] raises on it (and on
   * null) in-plan; weight EXACTLY 0 is the well-defined never-drawn
   * limit and its rows are excluded there before the key computes.
   */
  def exponentialKey(id: Column, weight: Column, seed: Long): Column =
    round(-log((hash16(id, seed).cast("double") + 1.0) / 65537.0)
      / weight.cast("double"), 9)

  /**
   * Exactly min(k, group size) rows per group, selected WITHOUT
   * replacement with probability proportional to `weightCol` — the
   * quality-weighted guarantee-count sampler ([[exactKPerGroup]]'s
   * uniform rule with weights; [[byQuality]]'s weighting without its
   * binomial count variance). Map-side key computation + the bounded
   * top-k aggregate per group (≤ k state entries per group per task —
   * never a row_number window over the group partition).
   */
  def weightedKPerGroup(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: Long = 0L): DataFrame = {
    require(k > 0, "weightedKPerGroup: k must be positive")
    val topk = Similarity.topKUdaf(k)
    // the exponentialKey contract, enforced in-plan: a NEGATIVE or null
    // weight silently inverts the draw (always-wins / poisoned key) and
    // raises a named error on the offending ROW; weight EXACTLY 0 is the
    // well-defined Efraimidis–Spirakis limit — probability zero, never
    // drawn — so those rows are excluded rather than failing a 100 TB
    // sampling pass over one empty document
    val w = col(weightCol).cast("double")
    val checkedKey = when(w.isNull || w < 0.0,
        raise_error(concat(
          lit("weightedKPerGroup: negative or null weight for id "),
          col(idCol).cast("string"),
          lit(" — weights must be non-negative"))))
      .otherwise(exponentialKey(col(idCol), col(weightCol), seed))
    df.where(w.isNull || w =!= 0.0)
      .select(col(groupCol), col(idCol), checkedKey.as("__e"))
      .groupBy(col(groupCol))
      // score = -e: the aggregate's (score desc, id asc) order is exactly
      // (e asc, id asc)
      .agg(topk(-col("__e"), col(idCol)).as("tk"))
      .select(col(groupCol), explode(col("tk.items")).as("it"))
      .select(col("it._2").as(idCol), col(groupCol),
        round(-col("it._1"), 9).as("sample_key"))
  }
}

/** DuckDB renderings of the identical arithmetic, for the oracle. The id is
  * CAST to BIGINT up front: an INTEGER-typed id column would otherwise
  * overflow DuckDB's 32-bit arithmetic on the first multiply (Spark promotes
  * via the long literal), and the rendering — like the Spark side — requires
  * NON-NEGATIVE ids (SQL `%` is remainder, not pmod, and `>>` is an
  * arithmetic shift). */
object SamplingSql {

  def hash16(id: String, seed: Long = 0L): String = {
    require(seed >= 0L, "seed must be non-negative (SQL % is not pmod)")
    val i = s"CAST($id AS BIGINT)"
    val m32 = Sampling.M32
    val a = s"((($i % $m32) * ${Sampling.seedMult(seed)} + ($i >> 32) + ${14029L + seed}) % $m32)"
    val b = s"((($a % 65536) * ${Sampling.Mult} + ($a >> 16)) % $m32)"
    s"((($b % 65536) * ${Sampling.Mult} + ($b >> 16)) % 65536)"
  }

  def splitCase(id: String, splits: Seq[(String, Double)], seed: Long = 0L): String = {
    val bounds = splits.init.scanLeft(0L) { case (acc, (_, frac)) =>
      acc + math.round(frac * Sampling.Buckets)
    }.tail
    val whens = splits.init.zip(bounds).map { case ((name, _), bound) =>
      s"WHEN ${hash16(id, seed)} < $bound THEN '$name'"
    }
    s"CASE ${whens.mkString(" ")} ELSE '${splits.last._1}' END"
  }

  def sampleWhere(id: String, rate: Double, seed: Long = 0L): String =
    s"${hash16(id, seed)} < ${math.round(rate * Sampling.Buckets)}"

  def shuffleKey(id: String, seed: Long = 0L): String = hash16(id, seed)

  def shuffleBucket(id: String, nBuckets: Int, seed: Long = 0L): String =
    s"(${hash16(id, seed)} % $nBuckets)"

  /** Window mirror of [[Sampling.packSequences]]'s cumulative offset. */
  def cumBefore(groupCol: String, orderCol: String, nTokens: String): String =
    s"(sum($nTokens) OVER (PARTITION BY $groupCol ORDER BY $orderCol " +
      s"ROWS UNBOUNDED PRECEDING) - $nTokens)"
}
