package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic HTML → text extraction — the first gate of a
  * Common-Crawl-style curation pipeline (the input table carries
  * `html:binary`; everything downstream — quality, language-ID, dedup —
  * runs over the extracted text, and the north-rule invariant demands the
  * extraction be byte-reproducible per url).
  *
  * The rule is a fixed `regexp_replace` chain (codegen'd, single pass each,
  * no UDF, RE2-compatible subset — no backreferences/lookaround — so any
  * RE2 engine replays it byte-for-byte; the DuckDB oracle does):
  *
  *  1. drop `<script>`/`<style>` ELEMENTS including their content (case
  *     insensitive, dot-matches-newline, non-greedy to the matching close),
  *  2. drop HTML comments `<!-- … -->`,
  *  3. break block-level boundaries (`</p> </div> </li> </h1..6> </tr>
  *     <br>`) into newlines so paragraphs don't fuse,
  *  4. strip every remaining tag,
  *  5. decode the six ubiquitous entities (`&amp; &lt; &gt; &quot; &#39;
  *     &nbsp;`) — `&amp;` LAST so `&amp;lt;` decodes to the literal string
  *     `&lt;` exactly like a browser, not to `<`,
  *  6. collapse horizontal whitespace runs to one space, trim each line,
  *     collapse blank-line runs to one newline, trim the ends.
  *
  * Deliberately a heuristic (a full HTML5 tree builder is not expressible
  * as columns and not needed for corpus curation): unclosed script blocks
  * extract as-is, CDATA is not special-cased. The value is determinism —
  * the same bytes in give the same bytes out on every engine, at any
  * parallelism.
  */
object HtmlExtract {

  /** Extracted visible text of an HTML string column. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)</(p|div|li|h1|h2|h3|h4|h5|h6|tr|table|ul|ol|blockquote)>|<br[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]+>", " ")
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags,
      "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&nbsp;", " ")
    val amp = regexp_replace(ent, "&amp;", "&")
    // whitespace canonicalization: spaces/tabs collapse, then each line is
    // trimmed, then runs of blank lines collapse, then the ends are trimmed
    val sp = regexp_replace(amp, "[ \\t\\x0B\\f\\r]+", " ")
    val lineTrim = regexp_replace(sp, " ?\\n ?", "\n")
    val blankRuns = regexp_replace(lineTrim, "\\n{2,}", "\n")
    trim(regexp_replace(blankRuns, "^\\n|\\n$", ""))
  }

  /** Extraction from the raw `html:binary` column (the input-table shape):
    * decode as UTF-8, then [[extractText]]. */
  def extractTextFromBytes(html: Column): Column =
    extractText(decode(html, "UTF-8"))

  /** Title of the page: contents of the first `<title>` element, entities
    * decoded, whitespace collapsed; empty string when absent. */
  def title(html: Column): Column = {
    val raw = regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)
    val ent = regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      raw,
      "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"), "&nbsp;", " ")
    // explicit class, not \s: Java's \s includes \x0B, RE2's does not
    trim(regexp_replace(regexp_replace(ent, "&amp;", "&"), "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** Count of outbound links (`<a ... href=...>` occurrences) — a standard
    * boilerplate/quality signal (link farms have high link-to-text ratios). */
  def linkCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a[ \\t\\n][^>]*href"), lit(0)))
}
