package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/**
 * Per-host politeness scheduling of a crawl frontier: given the URLs a
 * crawl cycle wants to fetch (already robots-gated — [[Robots.gate]])
 * and each host's `Crawl-delay` ([[Robots.crawlDelays]]), assign every
 * URL its fetch slot so that fetches against one host are spaced at
 * least the host's delay apart, highest-priority URLs first, and URLs
 * that cannot be reached within the cycle's horizon are deferred to the
 * next cycle. Reference analogue: the uploader's `parallel_tables`
 * orchestration — global parallelism with strictly-sequential work per
 * resource (`BdeUploader.pm` table scheduling) — re-expressed for
 * (host, URL) instead of (database, table).
 *
 * Scale shape: ONE shuffle, the inherent cluster-by-host (per-host
 * sequencing cannot be computed without co-locating a host's URLs);
 * the delay table rides in as a broadcast, so resolution adds no
 * exchange. A cycle emits at most ceil(horizon / delay) rows per host,
 * so the slotting is a BOUNDED top-k aggregate (cap = ceil(horizonS /
 * min resolved delay), ≤ cap entries of state per host per map task,
 * combined map-side) — never a `row_number` window over the host
 * partition, which would external-sort a mega-host's ENTIRE frontier
 * (the canonically skewed key of web crawling: one host can hold 10⁸
 * frontier URLs) in one unsplittable task while emitting only the
 * bounded head. The sorted buffer's position IS the slot, so no window
 * runs at all; the deferred tail stays in the frontier store for the
 * next cycle.
 */
/** Bounded per-host slot buffer: (priority, url, id) ordered
  * (priority desc, url asc). Top-level so encoder codegen can
  * construct it (the [[graft.operators.TopKBuf]] convention). */
final case class SlotKBuf(items: Seq[(Double, String, String)])

object Frontier {

  /** Bounded top-k of (priority, url, id) by (priority desc, url asc) —
    * the [[Similarity.topKUdaf]] pattern with the scheduler's ordering
    * and an opaque id payload. An Aggregator, so Spark plans partial
    * aggregation: each map task holds ≤ k entries per host. */
  private final class SlotKAgg(k: Int)
      extends Aggregator[(Double, String, String), SlotKBuf, SlotKBuf] {
    private val ord =
      Ordering.by[(Double, String, String), (Double, String)] {
        case (p, u, _) => (-p, u)
      }
    def zero: SlotKBuf = SlotKBuf(Vector.empty)
    def reduce(buf: SlotKBuf, x: (Double, String, String)): SlotKBuf =
      // full buffer + x at-or-past the cut: x cannot place (stable sort
      // would order it after the equal/greater last element)
      if (buf.items.size >= k && ord.gteq(x, buf.items.last)) buf
      else SlotKBuf((buf.items :+ x).sorted(ord).take(k))
    def merge(a: SlotKBuf, b: SlotKBuf): SlotKBuf =
      SlotKBuf((a.items ++ b.items).sorted(ord).take(k))
    def finish(buf: SlotKBuf): SlotKBuf = buf
    def bufferEncoder = org.apache.spark.sql.Encoders.product[SlotKBuf]
    def outputEncoder = org.apache.spark.sql.Encoders.product[SlotKBuf]
  }

  /** One delay per host for `agent`, resolved with RFC 9309 group
    * precedence over [[Robots.crawlDelays]] rows: the agent's own
    * groups if any exist on that host, else the `*` groups; several
    * applicable groups combine to the most conservative (max) delay;
    * a host whose applicable groups declare no delay resolves to NO
    * row (the scheduler's default applies), even when an inapplicable
    * group declares one — the §2.2.1 exclusion trap. */
  def hostDelays(delays: DataFrame, agent: String): DataFrame =
    Robots.selectGroups(delays, agent)
      .groupBy(col("host"))
      .agg(max(col("delay_s")).as("delay_s"))
      .where(col("delay_s").isNotNull)

  /**
   * Freshness-driven revisit priority from capture history (Cho &
   * Garcia-Molina 2003, "Effective page refresh policies for Web
   * crawlers"): per URL, consecutive captures whose content digests
   * differ are observed CHANGES; the Poisson change rate estimates as
   * the bias-corrected `λ̂ = -ln((n - x + 0.5) / (n + 0.5)) / ī`
   * (n intervals, x changes, ī the mean interval), and the revisit
   * priority is the probability the page changed since its last
   * capture, `p = 1 - exp(-λ̂ · age)`. URLs captured once carry no
   * interval evidence and return NULL rate/priority (the caller's
   * cold-start policy decides — the estimator must not invent one).
   *
   * Scale shape: ONE shuffle clustering by URL; the per-URL `lag` is a
   * bounded window (a URL's capture history, CDX-sized), and the
   * groupBy that follows reuses the window's hash partitioning, so the
   * fold adds no exchange. `nowTs` is an injected literal (the clock
   * never comes from the engine — the reference's injectable job
   * clock, `sql/02-bde_control_functions.sql.in` event times).
   *
   * Returns (urlCol, n_intervals, n_changes, mean_interval_s,
   * change_rate, p_changed).
   */
  def revisitPriority(
      captures: DataFrame, urlCol: String, tsCol: String,
      digestCol: String, nowTs: String): DataFrame = {
    // digest tiebreak: equal-timestamp captures of one URL would leave
    // lag() peer order undefined (engine-/partitioning-dependent change
    // counts); with the digest in the order, only exact (ts, digest)
    // duplicates stay interchangeable — and those cannot change the
    // change count whichever way they land
    val byTime = Window.partitionBy(col(urlCol))
      .orderBy(col(tsCol), col(digestCol))
    // NTZ capture times read as UTC instants (the session runs UTC;
    // DuckDB's epoch_us makes the same reading)
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val prevUs = lag(us, 1).over(byTime)
    val changed = (col(digestCol) =!=
      lag(col(digestCol), 1).over(byTime)).cast("int")
    val nowUs = unix_micros(lit(nowTs).cast("timestamp"))
    val g = captures
      .select(col(urlCol), us.as("__us"), prevUs.as("__prev"),
        changed.as("__chg"))
      .groupBy(col(urlCol))
      .agg(count(col("__prev")).as("n_intervals"),
        coalesce(sum(col("__chg")), lit(0L)).as("n_changes"),
        (avg(col("__us") - col("__prev")) / 1e6).as("mean_interval_s"),
        ((nowUs - max(col("__us"))) / 1e6).as("__age_s"))
    val rate = -log((col("n_intervals") - col("n_changes") + lit(0.5)) /
      (col("n_intervals") + lit(0.5))) / col("mean_interval_s")
    // a zero mean interval (all captures at one instant) is as
    // evidence-free as a single capture: NULL, never an Infinity rate
    val hasEvidence =
      col("n_intervals") > 0 && col("mean_interval_s") > 0
    g.select(col(urlCol), col("n_intervals"), col("n_changes"),
        col("mean_interval_s"),
        when(hasEvidence, rate).as("change_rate"),
        when(hasEvidence,
          lit(1.0) - exp(-rate * col("__age_s"))).as("p_changed"))
  }

  /**
   * Apportion a crawl cycle's fetch budget across hosts proportionally
   * to a score mass (rank sums, document counts, revisit pressure) with
   * EXACT sum preservation — the largest-remainder (Hamilton) method:
   * every host gets `floor(budget · score / total)`, and the leftover
   * slots go to the largest fractional remainders (key-ordered
   * tiebreak). Pure integer arithmetic, so allocations are
   * bit-identical across engines; Σ alloc = budget exactly, which
   * per-host rounding cannot promise.
   *
   * Scale shape: the apportionment inherently needs the GLOBAL remainder
   * order, but never a single-partition window — the top-`leftover` set
   * is bounded by its CUTOFF row, found with the same two-pass
   * partition-ranked numbering as [[SuffixArray]]'s distributed dense
   * rank: range-partition (remainder desc, key), count rows per
   * partition (P driver rows, not data), prefix-sum driver-side, and
   * fetch the single row at global index leftover−1 from its partition.
   * The returned frame then takes its +1 from a plain comparison against
   * the cutoff literals — lazy, lineage-recomputable, no checkpoint
   * blocks to lose. Every pass is fully parallel; at 10⁸ hosts no task
   * ever holds more than its partition. Overflow is guarded
   * distributedly: the total rides a 1-row `raise_error` arm that fails
   * LOUDLY when `total × budget` would wrap.
   */
  def apportionBudget(
      scores: DataFrame, keyCol: String, scoreCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "apportionBudget: budget must be positive")
    val spark = scores.sparkSession
    // negative scores would break the exact-sum contract silently
    // (truncating div diverges from floor, leftover can go negative) —
    // refuse them loudly, with the total bounds
    val tot = scores
      .agg(sum(col(scoreCol)).cast("long").as("__tot"),
        min(col(scoreCol)).cast("long").as("__min"))
      .select(when(col("__min") < 0 || col("__tot") <= 0 ||
          col("__tot") > Long.MaxValue / budget,
        raise_error(concat(lit("apportionBudget: scores must be " +
          s"non-negative with total in 1..${Long.MaxValue / budget} " +
          s"for budget=$budget"), lit(""))))
        .otherwise(col("__tot")).as("__tot"))
    val based = scores
      .select(col(keyCol), col(scoreCol).cast("long").as("score"))
      .crossJoin(tot)
      .select(col(keyCol), col("score"),
        expr(s"(score * ${budget}L) div __tot").as("__base"),
        expr(s"(score * ${budget}L) % __tot").as("__rem"))
    // leftover = budget − Σ base: ONE driver row (the raise_error guard
    // above has already run inside this aggregate's plan)
    val leftover = based
      .agg((lit(budget) - coalesce(sum(col("__base")), lit(0L))).as("l"))
      .collect()(0).getLong(0)
    if (leftover == 0L)
      return based.select(col(keyCol), col("score"),
        col("__base").as("alloc"))
    // find the CUTOFF row — the leftover-th in (remainder desc, key asc)
    // order — with the two-pass partition ranking, then return a LAZY
    // frame whose +1 predicate compares against the cutoff literals.
    // Only the cutoff (one row) rides the driver; the result is plain
    // lineage-recomputable expressions over `scores`, so an executor
    // loss downstream recomputes instead of dying on a lost checkpoint
    // block. Keys must be unique per row (the host-aggregate contract) —
    // a duplicated (remainder, key) pair at the cutoff would over-take.
    val p = spark.sessionState.conf.numShufflePartitions
    val sorted = based
      .select(col("__rem"), col(keyCol))
      .repartitionByRange(p, col("__rem").desc, col(keyCol))
      .sortWithinPartitions(col("__rem").desc, col(keyCol))
      .rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cutRem, cutKey) =
      try {
        // pass 1: per-partition row counts — P driver values, not data
        val counts = sorted.mapPartitionsWithIndex { (pid, it) =>
          // count in a Long: Iterator.size returns Int, which overflows
          // past 2^31 rows in one partition at frontier scale
          var n = 0L
          while (it.hasNext) { it.next(); n += 1L }
          Iterator.single((pid, n))
        }.collect().sortBy(_._1).map(_._2)
        val offsets = counts.scanLeft(0L)(_ + _)
        val cutIdx = leftover - 1 // global index of the last +1 row
        val cutPid = counts.indices
          .find(i => offsets(i) <= cutIdx && cutIdx < offsets(i + 1))
          .getOrElse(sys.error(
            s"apportionBudget: leftover $leftover exceeds host count"))
        val local = cutIdx - offsets(cutPid)
        // pass 2: read ONE row from the cutoff partition
        val cut = sorted.mapPartitionsWithIndex { (pid, it) =>
          if (pid != cutPid) Iterator.empty
          else {
            var i = 0L
            var res: Option[org.apache.spark.sql.Row] = None
            while (it.hasNext && res.isEmpty) {
              val r = it.next()
              if (i == local) res = Some(r)
              i += 1L
            }
            res.iterator
          }
        }.collect()(0)
        (cut.getLong(0), cut.get(1))
      } finally {
        sorted.unpersist(blocking = false)
      }
    based.select(col(keyCol), col("score"),
      (col("__base") + when(col("__rem") > cutRem ||
          (col("__rem") === cutRem && col(keyCol) <= lit(cutKey)), 1L)
        .otherwise(0L)).as("alloc"))
  }

  /**
   * Assign each URL of one crawl cycle its politeness slot. `urls`
   * carries (idCol, urlCol, priorityCol); `delays` is [[hostDelays]]
   * output (host, delay_s). Returns (idCol, urlCol, host, priority,
   * slot, delay_s, sched_s) for the URLs fetchable within
   * `horizonS` seconds: per host, slot k goes to the k-th URL by
   * (priority desc, url asc — the deterministic tiebreak) and is
   * fetched at `sched_s = k * delay_s`; hosts without a resolved
   * delay use `defaultDelayS`.
   *
   * A host emits at most ceil(horizonS / delay_s) rows, so the slotting
   * is ONE bounded top-k aggregate per host with cap = ceil(horizonS /
   * min resolved delay) — the global minimum lower-bounds every host's
   * delay, so the cap upper-bounds every host's emitted count and the
   * pre-horizon results are identical to ranking the full frontier.
   * The cap is computed driver-side from the delay table (it rides to
   * every task as a broadcast anyway — one extra driver read of a
   * broadcast-sized frame). The sorted buffer's position is the slot;
   * the horizon cut then trims hosts whose own delay exceeds the
   * minimum. Delays must be positive — a zero delay would unbound the
   * cap — and the cap must stay sane (≤ 2²⁰ buffered rows per host);
   * both are enforced loudly.
   *
   * Null handling: a NULL priority (e.g. [[revisitPriority]]'s
   * cold-start URLs, which return no estimate by design) schedules
   * AFTER every prioritized URL of its host — the desc-nulls-last
   * convention — and surfaces as NULL in the output; a NULL url is
   * unfetchable and is dropped.
   */
  def schedule(
      urls: DataFrame, delays: DataFrame,
      idCol: String, urlCol: String, priorityCol: String,
      defaultDelayS: Double, horizonS: Double): DataFrame = {
    require(defaultDelayS > 0, "schedule: defaultDelayS must be positive")
    require(horizonS > 0, "schedule: horizonS must be positive")
    val minRow = delays
      .agg(min(col("delay_s").cast("double"))).head()
    val minDelay =
      if (minRow.isNullAt(0)) defaultDelayS
      else math.min(defaultDelayS, minRow.getDouble(0))
    require(minDelay > 0,
      s"schedule: resolved delays must be positive (min=$minDelay)")
    val cap = math.ceil(horizonS / minDelay)
    require(cap <= (1 << 20),
      s"schedule: horizon/min-delay cap $cap exceeds 2^20 buffered rows " +
        "per host — split the cycle into shorter horizons")
    val idType = urls.schema(idCol).dataType
    val prioType = urls.schema(priorityCol).dataType
    val top = udaf(new SlotKAgg(cap.toInt))
    urls
      .where(col(urlCol).isNotNull)
      .select(col(idCol).cast("string").as("__id"), col(urlCol),
        Robots.urlHost(col(urlCol)).as("host"),
        // nulls-last under the desc sort inside the typed aggregate
        // (the Tuple3 encoder's Double field is non-nullable): -∞ is
        // below every real priority and maps back to NULL on output
        coalesce(col(priorityCol).cast("double"),
          lit(Double.NegativeInfinity)).as("__prio"))
      .groupBy(col("host"))
      .agg(top(col("__prio"), col(urlCol), col("__id")).as("__top"))
      .select(col("host"),
        posexplode(col("__top.items")).as(Seq("__slot", "__e")))
      .join(broadcast(delays.select(col("host").as("__dh"),
        col("delay_s").as("__d"))), col("host") === col("__dh"), "left")
      .withColumn("delay_s", coalesce(col("__d"), lit(defaultDelayS)))
      .withColumn("slot", col("__slot").cast("long"))
      .withColumn("sched_s", col("slot") * col("delay_s"))
      .where(col("sched_s") < lit(horizonS))
      .select(col("__e._3").cast(idType).as(idCol),
        col("__e._2").as(urlCol), col("host"),
        when(col("__e._1") === lit(Double.NegativeInfinity), lit(null))
          .otherwise(col("__e._1")).cast(prioType).as("priority"),
        col("slot"), col("delay_s"), col("sched_s"))
  }

  /**
   * Conditional-revisit fetch plan (RFC 9110 §13.1): join the due
   * frontier against the crawl's fetch-state log (one row per completed
   * fetch: url, etag, last_modified, fetch_time) and emit each URL's
   * request validators — `If-None-Match` from the LATEST fetch's ETag
   * and `If-Modified-Since` from its Last-Modified, both when both
   * survive (§13.1.3: the recipient ignores If-Modified-Since when
   * If-None-Match is present, but the sender ships every validator it
   * holds — a 304 on either saves the payload bytes, the whole point of
   * revisit crawling at 100 TB). URLs with no fetch history go
   * unconditional (null validators).
   *
   * Latest-per-URL is one max_by aggregate over fetch_time (never a
   * per-URL window — a URL's history is unbounded over crawl releases,
   * the aggregate carries one struct); ties on fetch_time break to the
   * lexically-greater (etag, last_modified) pair, deterministic. The
   * plan is a single url-keyed shuffle of each side; validator VALUES
   * are opaque tokens echoed back per the RFC — the plan never parses
   * them.
   */
  def conditionalFetchPlan(
      frontier: DataFrame, state: DataFrame,
      urlCol: String = "url"): DataFrame =
    frontier.join(latestState(state, urlCol), Seq(urlCol), "left")
      .withColumn("if_none_match", col("__st.etag"))
      .withColumn("if_modified_since", col("__st.last_modified"))
      .withColumn("conditional",
        col("if_none_match").isNotNull || col("if_modified_since").isNotNull)
      .drop("__st")

  /** The latest fetch-state row per URL as ONE max_by aggregate (the
    * shared latest-wins fold of [[conditionalFetchPlan]] and
    * [[sitemapRefetchPlan]]) — never a per-URL window. */
  private def latestState(state: DataFrame, urlCol: String): DataFrame =
    state
      .groupBy(col(urlCol))
      .agg(max_by(
        struct(col("etag"), col("last_modified"), col("fetch_time")),
        struct(col("fetch_time"), col("etag"), col("last_modified")))
        .as("__st"))

  /**
   * Sitemap-freshness fetch plan — the `<lastmod>` half of revisit
   * crawling (sitemaps.org + RFC 9110 §13.1): the publisher's own
   * change signal decides WHETHER to spend validators at all. Per
   * sitemap entry (urlCol, lastmod — any type ordered consistently
   * with the state's fetch_time):
   *
   *  - never fetched → `due = 'new'` (plain fetch, null validators);
   *  - lastmod AFTER the latest fetch → `due = 'modified'` (the
   *    publisher declared a change — a conditional request would waste
   *    the round-trip on a guaranteed 200; null validators);
   *  - otherwise (older/absent lastmod) → `due = 'revalidate'` with
   *    [[conditionalFetchPlan]]'s validators from the latest state
   *    (both-null validators degrade to a plain fetch, flagged by
   *    `conditional = false`).
   *
   * Same single url-keyed join as the conditional plan; lastmod is
   * compared, never parsed (upstream owns the W3C-datetime →
   * comparable conversion, [[graft.sources.Sitemaps]] the extraction).
   */
  def sitemapRefetchPlan(
      entries: DataFrame, state: DataFrame,
      urlCol: String = "url", lastmodCol: String = "lastmod"): DataFrame =
    entries.join(latestState(state, urlCol), Seq(urlCol), "left")
      .withColumn("due",
        when(col("__st").isNull, lit("new"))
          .when(col(lastmodCol).isNotNull &&
            col(lastmodCol) > col("__st.fetch_time"), lit("modified"))
          .otherwise(lit("revalidate")))
      .withColumn("if_none_match",
        when(col("due") === "revalidate", col("__st.etag")))
      .withColumn("if_modified_since",
        when(col("due") === "revalidate", col("__st.last_modified")))
      .withColumn("conditional",
        col("if_none_match").isNotNull || col("if_modified_since").isNotNull)
      .drop("__st")
}
