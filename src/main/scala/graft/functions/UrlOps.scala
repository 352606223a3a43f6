package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization for web-corpus pipelines — the key-normalization
 * step in front of URL-keyed dedup (crawl frontiers and web dumps carry
 * the same page under `http://`/`https://`, with/without default ports,
 * with volatile tracking parameters and fragments). URL-level dedup is
 * the first dedup stage of RefinedWeb (Penedo et al. 2023,
 * arXiv:2306.01116 §3.2) and the Dolma toolkit.
 *
 * Entirely `regexp_replace`/`regexp_extract` chains — codegen'd, no UDF,
 * a pure per-row projection that streams at scan speed. The rule set (in
 * this order; each step's output feeds the next):
 *
 *  1. scheme and host lowercase (path/query stay case-sensitive);
 *  2. fragment stripped (`#...`);
 *  3. default ports stripped (`http…:80`, `https…:443`);
 *  4. tracking parameters stripped (`utm_*`, `fbclid`, `gclid`), then
 *     separator runs repaired (`?&`→`?`, `&&`→`&`) and a dangling
 *     `?`/`&` removed;
 *  5. one trailing `/` stripped.
 *
 * The intent is pinned by `url_pinned`'s hand-derived literal VALUES —
 * there is deliberately NO second engine rendering to echo a mistake.
 */
object UrlOps {

  private val SchemeHost = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

  def normalizeUrl(u: Column): Column = {
    val lowered = concat(
      lower(regexp_extract(u, SchemeHost, 1)),
      regexp_replace(u, SchemeHost, ""))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    val noPort = regexp_replace(
      regexp_replace(noFrag, "^(http://[^/:?#]+):80([/?#].*)?$", "$1$2"),
      "^(https://[^/:?#]+):443([/?#].*)?$", "$1$2")
    val noTrack = regexp_replace(noPort,
      "([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", "$1")
    val repaired = regexp_replace(
      regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    val noDangle = regexp_replace(repaired, "[?&]+$", "")
    regexp_replace(noDangle, "/$", "")
  }

  /** URL-keyed exact dedup: keep the lowest-id row per canonical URL —
    * [[normalizeUrl]] then the same map-side-combinable `min_by` keep rule
    * as content dedup (never a window over the URL partition; a hot URL
    * ships one candidate row per mapper). */
  def urlDedup(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      urlCol: String): org.apache.spark.sql.DataFrame =
    df.groupBy(normalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(min_by(struct(df.columns.map(col): _*), col(idCol)).as("__row"))
      .select(col("__row.*"), col("canonical_url"))

  /** Canonical-link-aware URL dedup (RFC 6596 composed into
    * [[urlDedup]]'s keep rule): rows group by their DECLARED canonical
    * target when one exists ([[graft.functions.HtmlOps.extractCanonical]]'s
    * output, normalized by the same rules), else by their own canonical
    * form — so mirror/variant pages collapse onto the page they
    * declare, whatever URL they were fetched under. Same
    * map-side-combinable `min_by` fold, never a window. */
  def canonicalDedup(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      urlCol: String,
      declaredCol: String): org.apache.spark.sql.DataFrame =
    // one keep rule, one site: normalizeUrl null-propagates, so keying
    // urlDedup on the pre-coalesced raw URL is exactly grouping by
    // coalesce(normalize(declared), normalize(own))
    urlDedup(
      df.withColumn("__eff", coalesce(col(declaredCol), col(urlCol))),
      idCol, "__eff")
      .drop("__eff")

  /** Spider-trap signals of one URL — the frontier-side heuristics that
    * keep a crawler out of infinite URL spaces (calendar pages, session
    * echoes, faceted-search explosions; Heydon & Najork's Mercator and
    * every production crawler since apply this family before fetching):
    *
    *  - `depth`: non-empty path segments;
    *  - `dup_segments`: segments minus distinct segments (a repeated
    *    segment is the classic self-embedding trap `/a/b/a/b/…`);
    *  - `n_params`: `&`-separated query parameters (duplicate keys
    *    count — parameter echo IS the signal);
    *  - `url_len`: total characters.
    *
    * Pure per-row array/regex expressions — no explode, no shuffle. */
  def trapSignals(u: Column): Column = {
    val path = regexp_replace(
      regexp_replace(u, SchemeHost, ""), "[?#].*$", "")
    val segs = filter(split(path, "/"), s => s =!= "")
    val query = regexp_extract(u, "\\?([^#]*)", 1)
    val nParams = when(query === "", lit(0))
      .otherwise(size(split(query, "&")))
    struct(
      size(segs).cast("long").as("depth"),
      (size(segs) - size(array_distinct(segs))).cast("long")
        .as("dup_segments"),
      nParams.cast("long").as("n_params"),
      length(u).cast("long").as("url_len"))
  }

  /** (idCol, urlCol, depth, dup_segments, n_params, url_len, is_trap):
    * a URL is a trap candidate when any signal EXCEEDS its max — every
    * bound is inclusive (a URL at exactly the max passes). */
  def trapFilter(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      urlCol: String,
      maxDepth: Int = 8,
      maxDupSegments: Int = 1,
      maxParams: Int = 6,
      maxLen: Int = 512): org.apache.spark.sql.DataFrame = {
    val sig = trapSignals(col(urlCol))
    df.select(col(idCol), col(urlCol), sig.as("__sig"))
      .select(col(idCol), col(urlCol), col("__sig.*"))
      .withColumn("is_trap",
        col("depth") > maxDepth || col("dup_segments") > maxDupSegments ||
          col("n_params") > maxParams || col("url_len") > maxLen)
  }
}
