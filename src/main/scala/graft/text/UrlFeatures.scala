package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing / normalization features — the per-page key handling of a
  * web-corpus pipeline (domain quotas, per-host dedup, crawl-frontier
  * joins all key on pieces of the url). All pure `regexp_extract` /
  * `regexp_replace` column chains in the RE2-compatible subset — codegen'd,
  * no UDF, byte-reproducible on any RE2 engine (the DuckDB oracle).
  *
  * The grammar handled is the pragmatic crawl subset:
  * `scheme://[user@]host[:port][/path][?query][#fragment]` with scheme-less
  * urls treated as host-first. Missing pieces extract as empty string (the
  * `regexp_extract` no-match convention, identical in Spark and DuckDB).
  */
object UrlFeatures {

  /** Lowercased scheme (`https`, `http`, …); empty when scheme-less. */
  def scheme(url: Column): Column =
    lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  /** Lowercased host: the authority with any credentials and port stripped.
    * Scheme-less urls ("example.com/x") parse host-first. */
  def host(url: Column): Column = {
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noCreds = regexp_replace(afterScheme, "^[^/?#@]*@", "")
    lower(regexp_extract(noCreds, "^([^/:?#]+)", 1))
  }

  /** Registrable domain HEURISTIC: last two host labels, or last three when
    * the second-to-last is a well-known second-level zone (co/com/net/org/
    * ac/gov/edu — "bbc.co.uk" → "bbc.co.uk", not "co.uk"). A full public-
    * suffix list is a data file, not logic; at curation scale this fixed
    * rule is the standard approximation and is DETERMINISTIC, which is what
    * quota/dedup keys require. IP-literal hosts return themselves. */
  def registrableDomain(url: Column): Column = {
    val h = host(url)
    val ip = regexp_extract(h, "^(\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3})$", 1)
    val three = regexp_extract(h,
      "([^.]+\\.(?:co|com|net|org|ac|gov|edu)\\.[^.]+)$", 1)
    val two = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(ip =!= "", ip)
      .when(three =!= "", three)
      .when(two =!= "", two)
      .otherwise(h)
  }

  /** Path component (leading `/` included); empty for bare hosts. */
  def path(url: Column): Column = {
    val afterScheme = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noCreds = regexp_replace(afterScheme, "^[^/?#@]*@", "")
    regexp_extract(noCreds, "^[^/?#]*(/[^?#]*)", 1)
  }

  /** Path depth = number of non-empty `/`-separated segments
    * ("/a/b/" → 2, "/" → 0, "" → 0). */
  def pathDepth(url: Column): Column =
    size(regexp_extract_all(path(url), lit("/[^/]"), lit(0)))

  /** Number of `&`-separated parameters in the query string (0 when none). */
  def queryParamCount(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    when(q === "", lit(0)).otherwise(size(split(q, "&")))
  }

  /** Canonical url for dedup/quota keys: scheme and host lowercased,
    * credentials, default ports (:80/:443), fragment, and a trailing
    * slash on a bare path all stripped; query kept (it selects content).
    * Deterministic — two crawls of the same page key identically. */
  def normalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val sch = regexp_replace(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://",
      "") // re-attached lowercased below
    val schVal = scheme(noFrag)
    val noCreds = regexp_replace(sch, "^[^/?#@]*@", "")
    val hostPart = regexp_extract(noCreds, "^([^/?#]+)", 1)
    val rest = regexp_replace(noCreds, "^[^/?#]+", "")
    val hostNorm = regexp_replace(lower(hostPart), ":(80|443)$", "")
    val restNorm = regexp_replace(rest, "^/$", "")
    concat(
      when(schVal === "", lit("")).otherwise(concat(schVal, lit("://"))),
      hostNorm, restNorm)
  }
}
