package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Domain-level web-corpus curation — the per-HOST stage that runs before
 * (and alongside) per-document filtering in web-scale pipelines:
 *
 *  - **blocklist filtering**: drop every page whose host is a blocked
 *    domain or any subdomain of one (RefinedWeb, Penedo et al. 2023,
 *    arXiv:2306.01116 §3.1 "URL filtering"; the Dolma toolkit's
 *    domain-blocklist taggers). Matching is at dot-label boundaries only:
 *    `ads.example.com` is blocked by `example.com`, `notexample.com` is
 *    not.
 *  - **domain quality pruning**: aggregate a per-document signal to the
 *    host (mean tokens per page here) and drop ENTIRE hosts whose
 *    aggregate falls below threshold — spam/boilerplate farms look fine
 *    page-by-page and only show up in aggregate.
 *
 * Scale posture (100 TB corpus, ~10⁷ distinct hosts):
 *  - host extraction and suffix expansion are pure per-row projections
 *    (regex + a bounded ≤ label-count array), codegen'd, zero shuffle;
 *  - blocklist matching is `arrays_overlap` against a literal array —
 *    Catalyst evaluates it with a hash set over the larger side, so the
 *    filter stays MAP-SIDE with no Exchange at any corpus size (for
 *    blocklists past the low millions, swap the literal for an exploded
 *    suffix equi-join against a broadcast blocklist table — same
 *    semantics, one broadcast);
 *  - domain statistics are one `groupBy(host)` aggregate (map-side
 *    combined, host-count-sized output) whose result BROADCASTS back onto
 *    the corpus — the corpus never self-joins, and the per-domain mean
 *    rides an exact integer token-count sum divided once, so it is
 *    bit-identical in any engine and under any partitioning (a running
 *    double mean would be combine-order-dependent).
 */
object Domains {

  /** Lowercase host of a URL: scheme-relative authority with userinfo and
    * port stripped. Rows that do not parse as absolute URLs yield ''. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1))

  /** Every dot-boundary suffix of a host, longest first:
    * `a.b.c` → [`a.b.c`, `b.c`, `c`]. Bounded by the label count (hosts
    * have ≲ 10 labels), so the expansion is a constant-factor projection,
    * not a join fan-out. */
  def hostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Keep rows whose host is NOT a blocked domain nor a subdomain of one.
    * Adds the extracted `host` column; the match is a map-side
    * `arrays_overlap` against the (lowercased) blocklist literal — no
    * Exchange.
    *
    * Unparseable URLs ([[hostOf]] yields `''`) PASS the filter: a
    * blocklist names real domains, and an empty host can never match one
    * — the row is unattributable, not blocked. Callers that want
    * malformed URLs gone filter `host =!= ""` on the result (the added
    * column makes that a map-side predicate). */
  def blocklistFilter(
      df: DataFrame,
      urlCol: String,
      blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "blocklistFilter: empty blocklist")
    val blockedLit = typedlit(blocked.map(_.toLowerCase).toArray)
    df.withColumn("host", hostOf(col(urlCol)))
      .where(!arrays_overlap(hostSuffixes(col("host")), blockedLit))
  }

  /** Per-host document count and mean tokens per document. `tokensCol`
    * must be an integer token count. The mean divides an exact LONG sum
    * once (sums < 2⁵³ are exact in the double quotient), so the value is
    * combine-order independent. */
  def domainStats(df: DataFrame, hostCol: String, tokensCol: String): DataFrame =
    df.groupBy(col(hostCol))
      .agg(count(lit(1)).as("n_docs"),
        (sum(col(tokensCol)).cast("double") / count(lit(1)))
          .as("mean_tokens"))

  /** Drop ENTIRE hosts whose mean tokens/doc falls below `minMeanTokens`;
    * surviving rows carry their host's rounded mean. One host-sized
    * aggregate + one broadcast join back — the corpus is scanned twice but
    * never shuffled on a corpus-sized key.
    *
    * Unparseable URLs pool into the single `''` pseudo-host and are kept
    * or dropped COLLECTIVELY by that group's mean — deliberate: rows
    * that cannot be attributed to a domain form their own "domain", and
    * a per-domain rule should treat them as one. Callers wanting them
    * exempted (or always dropped) filter `hostOf(url) === ""` before the
    * prune. */
  def domainQualityPrune(
      df: DataFrame,
      urlCol: String,
      tokensCol: String,
      minMeanTokens: Double): DataFrame = {
    val hosted = df.withColumn("host", hostOf(col(urlCol)))
    val keep = domainStats(hosted, "host", tokensCol)
      .where(col("mean_tokens") >= minMeanTokens)
      .select(col("host"),
        round(col("mean_tokens"), 6).as("domain_mean_tokens"))
    hosted.join(broadcast(keep), Seq("host"))
  }
}
