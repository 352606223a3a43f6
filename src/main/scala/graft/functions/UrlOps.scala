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
}
