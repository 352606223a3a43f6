package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.SparkSuite

/** Brute-force property checks for the session's rank/funnel operators:
  * the skew-safe plans must equal the obvious sequential definitions on
  * arbitrary inputs. */
class OpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def run(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("rank normalize equals the strictly-below fraction, any input") {
    val genRows = Gen.listOf(for {
      g <- Gen.oneOf("a", "b", "c")
      s <- Gen.choose(0, 100).map(_ / 100.0)
    } yield (g, s)).suchThat(_.nonEmpty)
    run(Prop.forAllNoShrink(genRows) { rows =>
      val df = rows.zipWithIndex.map { case ((g, s), i) => (i.toLong, g, s) }
        .toDF("id", "g", "s")
      val got = RankNormalize.percentileRank(df, "g", col("s"),
          buckets = 256)
        .select("id", "rank_pct").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      def qb(s: Double) = math.max(0L, math.min(
        math.floor(BigDecimal(s).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble * 256).toLong, 255L))
      val want = rows.zipWithIndex.map { case ((g, s), i) =>
        val grp = rows.filter(_._1 == g)
        val below = grp.count(r => qb(r._2) < qb(s))
        i.toLong -> BigDecimal(below.toDouble / grp.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("blocklist filter equals the naive dot-boundary suffix rule") {
    val label = Gen.oneOf("a", "b", "spam", "x")
    val genHost = Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, label).map(_.mkString(".")))
    val genCase = for {
      hosts <- Gen.listOf(genHost)
      blocked <- Gen.listOf(genHost).map(_.distinct)
    } yield (hosts, blocked)
    run(Prop.forAllNoShrink(genCase) {
      case (hosts, blocked) if blocked.nonEmpty =>
        val pages = hosts.zipWithIndex
          .map { case (h, i) => (i.toLong, s"https://$h/p") }
          .toDF("id", "url")
        val kept = Domains.blocklistFilter(pages, "url", blocked)
          .select("id").collect().map(_.getLong(0)).toSet
        val want = hosts.zipWithIndex.collect {
          case (h, i) if !blocked.exists(b => h == b || h.endsWith("." + b)) =>
            i.toLong
        }.toSet
        (kept == want) :| s"hosts=$hosts blocked=$blocked " +
          s"kept=$kept want=$want"
      case _ => Prop.passed
    })
  }

  test("weighted-k selection equals a driver-side sort of the same keys") {
    val genRows = Gen.listOf(for {
      g <- Gen.oneOf("a", "b")
      w <- Gen.choose(1, 1000)
    } yield (g, w.toDouble)).suchThat(_.nonEmpty)
    run(Prop.forAllNoShrink(Gen.zip(genRows, Gen.choose(1, 6))) {
      case (rows, k) =>
        val df = rows.zipWithIndex.map { case ((g, w), i) =>
          (i.toLong, g, w) }.toDF("id", "g", "w")
        val got = Sampling.weightedKPerGroup(df, "g", "id", "w", k, seed = 5)
          .select("g", "id").collect()
          .map(r => (r.getString(0), r.getLong(1))).toSet
        // independent path: compute every row's exponential key through a
        // plain projection, then take each group's k smallest driver-side
        // with the same (key, id) order — no top-k aggregate involved
        val keys = df.select(col("g"), col("id"),
            Sampling.exponentialKey(col("id"), col("w"), 5L).as("e"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        val want = keys.groupBy(_._1).toSeq.flatMap { case (g, grp) =>
          grp.sortBy(t => (t._3, t._2)).take(k).map(t => (g, t._2)).toSeq
        }.toSet
        (got == want) :| s"k=$k got=$got want=$want"
    })
  }

  test("funnel counts equal the sequential per-user simulation") {
    val stages = Seq("s1", "s2", "s3")
    val genEvents = Gen.listOf(for {
      u <- Gen.choose(1L, 6L)
      t <- Gen.choose(0, 30)
      st <- Gen.oneOf("s1", "s2", "s3", "other")
    } yield (u, st, t)).suchThat(_.nonEmpty)
    run(Prop.forAllNoShrink(genEvents) { evs =>
      val df = evs.map { case (u, st, t) =>
        (u, st, new Timestamp(t * 1000L)) }.toDF("user_id", "et", "ts")
      val got = Funnel.funnelCounts(df, "user_id", "et", "ts", stages)
        .select("stage", "n_users").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // sequential reference: per user, walk the stage list taking the
      // earliest strictly-later event of each next type
      val reached = Array.fill(stages.size)(0L)
      evs.groupBy(_._1).foreach { case (_, uevs) =>
        var prev = Long.MinValue
        var k = 0
        var continue = true
        while (k < stages.size && continue) {
          val cand = uevs.filter(e => e._2 == stages(k) && e._3 * 1000L > prev)
          if (cand.isEmpty) continue = false
          else {
            prev = cand.map(_._3 * 1000L).min
            reached(k) += 1
            k += 1
          }
        }
      }
      val want = stages.indices.map(i => (i + 1).toLong -> reached(i)).toMap
      (got == want) :| s"got=$got want=$want"
    })
  }

  test("componentsMerge equals the cold recompute on arbitrary release splits") {
    // random small graphs, random 2-way split of the pair log into
    // releases: star-edge maintenance over release 1's labels + release
    // 2's pairs must equal the cold closure over the union — the
    // incremental cluster index's correctness argument, brute-forced
    val genCase = for {
      n <- Gen.choose(2, 14)
      nEdges <- Gen.choose(1, 20)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
      split <- Gen.listOfN(edges.size, Gen.oneOf(true, false))
    } yield (n, edges.distinct, split)
    run(Prop.forAllNoShrink(genCase) { case (n, edges, split) =>
      val r1 = edges.zip(split).collect { case (e, true) => e }
      val r2 = edges.zip(split).collect { case (e, false) => e }
      (r1.nonEmpty && r2.nonEmpty) ==> {
        val p1 = r1.toDF("id_a", "id_b")
        val m1 = r1.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
        val prior = Dedup.connectedComponents(m1, "id", p1)
        val got = Dedup.componentsMerge(prior, "id", "component",
            r2.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val allM = edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
        val cold = Dedup.connectedComponents(allM, "id",
            edges.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (got == cold) :| s"edges=$edges split=$split got=$got cold=$cold"
      }
    })
  }

  test("train-shard assembly conserves tokens; boundaries count the packed docs") {
    // arbitrary doc sizes in one group: every produced sequence is
    // exactly seqLen tokens in stream order, the kept+dropped token
    // count equals the input total, and boundary positions are exactly
    // the doc starts landing inside complete sequences
    val genDocs = Gen.listOf(Gen.choose(1, 9)).suchThat(_.nonEmpty)
    run(Prop.forAllNoShrink(genDocs) { sizes =>
      val seqLen = 6
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, "g", (0 until n).map(j => i * 100 + j))
      }.toDF("id", "grp", "toks")
      val got = TrainShards.assembleSequences(docs, "grp", "id", "toks",
          seqLen)
        .orderBy(col("seq_id")).collect()
        .map(r => (r.getLong(1), r.getSeq[Int](2), r.getSeq[Int](3)))
      val stream = sizes.zipWithIndex.flatMap { case (n, i) =>
        (0 until n).map(j => i * 100 + j)
      }
      val nSeqs = stream.size / seqLen
      val wantSeqs = (0 until nSeqs).map(k =>
        stream.slice(k * seqLen, (k + 1) * seqLen))
      val starts = sizes.scanLeft(0)(_ + _).dropRight(1)
      val wantBounds = (0 until nSeqs).map(k =>
        starts.filter(p => p >= k * seqLen && p < (k + 1) * seqLen)
          .map(_ % seqLen))
      val okSeqs = got.map(_._2.toSeq).toSeq == wantSeqs
      val okBounds = got.map(_._3.toSeq).toSeq == wantBounds
      val okIds = got.map(_._1).toSeq == (0L until nSeqs.toLong)
      (okSeqs && okBounds && okIds) :|
        s"sizes=$sizes got=${got.toSeq} want=$wantSeqs/$wantBounds"
    })
  }

  test("gpt2 pre-tokenization is a lossless partition of arbitrary strings") {
    val genText = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\u00a0', '\t', '\n', '\u2028'),
      Gen.oneOf('\'', '.', ',', '\u2014', '\u20ac', '\u8a9e', '\u00df')))
      .map(_.mkString)
    run(Prop.forAllNoShrink(genText) { s =>
      val pieces = Seq(Tuple1(s)).toDF("t")
        .select(graft.functions.TextOps.pretokenizeGpt2(col("t")))
        .first().getSeq[String](0)
      (pieces.mkString == s && pieces.forall(_.nonEmpty)) :|
        s"text=${s.take(40)} pieces=$pieces"
    })
  }
}
