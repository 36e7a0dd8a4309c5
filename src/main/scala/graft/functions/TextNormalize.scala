package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization for training-data pipelines: Unicode NFC, case
  * folding, whitespace collapse, boilerplate-line stripping. Every real
  * corpus normalizes BEFORE dedup — otherwise trivially-different bytes
  * ("Café" composed vs decomposed, double spaces, footer lines) defeat
  * exact and near-dup matching alike.
  *
  * All stages are codegen-friendly Column expressions (the NFC stage is
  * the custom [[graft.expressions.NfcNormalize]] with an ASCII fast path)
  * and each has an exact DuckDB equivalent, so the composed pipeline is
  * oracle-gated end to end:
  *  - nfc            ↔ `nfc_normalize(text)`
  *  - foldCase       ↔ `lower(text)`
  *  - collapseWhitespace ↔ `trim(regexp_replace(text, '\s+', ' ', 'g'))`
  *    (pattern sticks to ASCII space/tab/newline — Java `\s` and RE2 `\s`
  *    agree on those; `\x0B` is Java-only, so inputs never contain it)
  *  - stripBoilerplate   ↔ `list_filter(string_split(...), …)` + rejoin
  */
object TextNormalize {

  /** Unicode canonical composition (NFC). */
  def nfc(text: Column): Column =
    graft.expressions.NfcFunctions.nfc_normalize(text)

  /** Case folding — simple lowercase, the cross-engine-stable mapping. */
  def foldCase(text: Column): Column = lower(text)

  /** Collapse runs of whitespace to single spaces and trim the ends. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Default boilerplate line pattern: copyright/footer/navigation junk.
    * Anchored at line start, case-insensitive; both Java and RE2 regex. */
  val defaultBoilerplate: String =
    "(?i)^\\s*(copyright\\b|all rights reserved\\b|terms of (service|use)\\b|privacy policy\\b|click here\\b)"

  /** Drop whole lines matching a boilerplate pattern, keep the rest in
    * order. Line = '\n'-separated; the match is an unanchored regex find
    * per line (same semantics as DuckDB `regexp_matches`). */
  def stripBoilerplate(text: Column, pattern: String = defaultBoilerplate): Column =
    array_join(filter(split(text, "\n"), l => !l.rlike(pattern)), "\n")

  /** The full normalization pipeline in canonical order: structural strip
    * first (needs the line layout), then NFC, then case fold, then
    * whitespace collapse (which destroys line structure last). */
  def normalize(text: Column, boilerplate: String = defaultBoilerplate): Column =
    collapseWhitespace(foldCase(nfc(stripBoilerplate(text, boilerplate))))

  /** PII patterns, in scrub order. Every pattern is BOTH-ENGINE-SAFE
    * regex (Java and RE2: no lookaround, no backreferences, ASCII classes
    * only) so the oracle replays the identical passes verbatim:
    *  - email: local@domain.tld (letters/digits/._%+- local part)
    *  - phone: international-ish +CC NNN[-]NNNN (requires the '+' so bare
    *    numbers — ids, quantities — never over-redact; NO optional
    *    trailing group — without lookahead it would greedily eat a
    *    following unrelated number, e.g. an IP's first octet)
    *  - ipv4: dotted quad, word-bounded
    * Order matters and is part of the contract: emails first (their
    * domains may contain digit runs), then phones, then IPs. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+\\d{1,3}[ -]\\d{3}[ -]?\\d{3,4}", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** PII scrub — the redaction stage every published-corpus pipeline runs
    * (C4/Dolma-style): replace emails, phone numbers, and IPv4 literals
    * with typed placeholder tokens and count what was redacted per
    * category. ONE map-only projection (three sequential codegen'd
    * regexp_replace passes + three regexp_count probes), zero exchanges
    * at any scale. Counts are probed per category on the text as the
    * PRIOR passes left it — the same text the replace pass sees — so
    * `n_<cat>` is exactly the number of substitutions that pass made. */
  def piiScrub(text: Column): Column = {
    val scrubbed = piiPatterns.foldLeft(text) { case (t, (_, re, tok)) =>
      regexp_replace(t, re, tok)
    }
    val counts = piiPatterns.scanLeft(text -> Option.empty[Column]) {
      case ((t, _), (_, re, tok)) =>
        regexp_replace(t, re, tok) -> Some(regexp_count(t, lit(re)))
    }.collect { case (_, Some(c)) => c }
    struct(
      scrubbed.as("text"),
      counts(0).cast("long").as("n_email"),
      counts(1).cast("long").as("n_phone"),
      counts(2).cast("long").as("n_ip"))
  }

  /** Canonical URL for dedup keying — the FIRST dedup stage of web-scale
    * corpora (CCNet/FineWeb dedupe by canonical URL before any text
    * pass): lowercase host with a leading `www.` stripped, path with the
    * trailing slash stripped, tracking (`utm_*`) query params dropped
    * with the remaining params kept IN ORDER, scheme and fragment
    * removed. Scheme-LESS forms are routine in crawl data, so the scheme
    * prefix (`https://` or protocol-relative `//`) is OPTIONAL: the
    * host/path parse runs on the remainder, and `b.org/y` keys the same
    * as `https://www.B.org/y/` — two unrelated bare URLs never collapse
    * to one empty key. Pure codegen'd string expressions (regexp
    * extracts + an array filter), map-only at any scale; a non-URL input
    * canonicalizes deterministically (its first path-ish segment), never
    * an error. */
  def urlCanonicalize(url: Column): Column = {
    // strip an optional scheme ("http://", "ftp://") or protocol-relative
    // "//" prefix; everything after it parses as host[/path][?q][#f]
    val rest = regexp_replace(url, "^([a-zA-Z]+:)?//", "")
    val host = regexp_replace(
      lower(regexp_extract(rest, "^([^/?#]+)", 1)), "^www\\.", "")
    val path = regexp_replace(
      regexp_extract(rest, "^[^/?#]*([^?#]*)", 1), "/$", "")
    val q = array_join(filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"),
      p => p =!= "" && !p.startsWith("utm_")), "&")
    concat(host, path,
      when(q =!= "", concat(lit("?"), q)).otherwise(lit("")))
  }
}
