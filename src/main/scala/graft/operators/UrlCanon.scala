package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for crawl dedup — the first gate of a web-scale
  * training-data pipeline: the same page is fetched under dozens of surface
  * forms (tracking params, shuffled query order, case-variant hosts,
  * trailing slashes, fragments), and canonicalizing before content dedup
  * collapses them with a pure per-row projection instead of a pairwise
  * similarity pass.
  *
  * Canonical form (documented spec, engine-portable — every rule is plain
  * regex/array SQL so an external oracle reproduces it bit-for-bit):
  *
  *  1. drop the `#fragment`;
  *  2. lowercase the scheme and host (the path keeps its case — it is
  *     case-significant on most servers);
  *  3. drop an explicit `:80`/`:443` default port;
  *  4. drop tracking params (`utm_*`, `fbclid`, `gclid`, `ref`);
  *  5. byte-sort the surviving query params;
  *  6. strip trailing `/` from the path.
  *
  * Assumes absolute `scheme://host[...]` URLs (a crawl frontier emits
  * those); rows that do not match the scheme-host shape keep their
  * path/query normalization but get an empty host prefix.
  *
  * Everything is `org.apache.spark.sql.functions` — per-row, no shuffle; the
  * only shuffle in [[dedupByCanonicalUrl]] is the final groupBy on the
  * canonical key, with map-side partial aggregation.
  */
object UrlCanon {

  /** Query params dropped during canonicalization (anchored key match).
    * `(=|$)` also matches the VALUELESS form (`?utm_source` with no `=`) —
    * common in the wild, and leaving it would keep the alias distinct from
    * its canonical page. */
  val trackingParamPattern = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

  private val schemeHostPattern = "^([A-Za-z][A-Za-z0-9+.-]*://[^/]+)"

  /** Canonical form of an absolute URL column (spec above). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    // split on the FIRST '?' only — '?' is legal INSIDE a query (RFC 3986),
    // so later '?' characters belong to the query, not a second separator
    val base  = substring_index(noFrag, "?", 1)
    val query = when(length(noFrag) > length(base),
      noFrag.substr(length(base) + lit(2), length(noFrag))).otherwise(lit(""))
    val schemeHost = regexp_extract(base, schemeHostPattern, 1)
    // default-port strip is scheme-conditional: :80 is only a default for
    // http, :443 only for https — stripping cross-scheme would alias
    // DISTINCT resources (http://h:443/x vs http://h/x) to one key
    val hostNorm = regexp_replace(
      regexp_replace(lower(schemeHost), "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val path       = base.substr(length(schemeHost) + lit(1), length(base))
    val pathNorm   = regexp_replace(path, "/+$", "")
    val params = filter(split(query, "&"),
      x => x =!= "" && !x.rlike(trackingParamPattern))
    val joined = array_join(array_sort(params), "&")
    concat(hostNorm, pathNorm,
      when(size(params) > 0, concat(lit("?"), joined)).otherwise(lit("")))
  }

  /** Collapse rows sharing a canonical URL: one group row per canonical
    * form with the minimum id as the deterministic survivor. One shuffle
    * (the groupBy on the canonical key) with map-side combine.
    *
    * Rows whose URL canonicalizes to NULL (missing input) OR to the empty
    * string (empty-string URLs — another 'missing' spelling, common at crawl
    * scale) are NOT collapsed together — each passes through as its own
    * singleton survivor (grouped by its own id), because a shared null/empty
    * key would silently drop every missing-URL document but one. */
  def dedupByCanonicalUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("canonical_url", canonicalizeUrl(col(urlCol)))
      .groupBy(col("canonical_url"),
        when(col("canonical_url").isNull || col("canonical_url") === "",
          col(idCol)).as("__singleton"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("n_dups"))
      .drop("__singleton")
}
