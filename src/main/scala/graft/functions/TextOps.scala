package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  *
  * Everything here is engine-portable by construction: tokenization is a
  * plain single-space split, and token/shingle hashing goes through
  * md5 → first 8 hex chars → unsigned 32-bit int, which any SQL engine
  * (and the DuckDB oracle) reproduces bit-for-bit. All combinators are
  * built-in higher-order functions — no UDFs, everything stays inside
  * whole-stage codegen.
  */
object TextOps {

  /** Whitespace tokens (single-space split, matching the corpus format). */
  def tokens(text: Column): Column = split(text, " ")

  /** Deterministic 32-bit unsigned hash of a string, portable across
    * engines: first 8 hex chars of md5, parsed base-16 → [0, 2^32).
    */
  def hash32(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Word n-gram shingles as strings; empty array when the doc is shorter
    * than n tokens (guards `sequence`'s descending-range behavior).
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Distinct shingle hashes for a document — the set fed to MinHash /
    * Jaccard. (Set semantics: duplicates dropped before hashing math.)
    */
  def shingleHashSet(text: Column, n: Int): Column =
    array_distinct(transform(shingles(tokens(text), n), h => hash32(h)))

  /** MinHash signature (length numHashes) over a set of 32-bit hashes,
    * using the classic (a·h + b) mod p family with p = 2^31 − 1 and
    * deterministic a_j = 2j+1, b_j = 31j²+7 — reproducible in any engine,
    * no RNG state to ship.
    */
  def minhashSignature(hashSet: Column, numHashes: Int): Column = {
    val p = 2147483647L
    transform(sequence(lit(0), lit(numHashes - 1)), j =>
      array_min(transform(hashSet, h =>
        (h * (j * 2 + 1) + (j * j * 31 + 7)) % p)))
  }

  /** Canonical URL normalization — the first step of every web-corpus
    * dedup pipeline (a crawl sees the same page under `HTTP://Host/p/`,
    * `http://host/p?utm_source=feed`, `http://host:80/p#top`, ...).
    * Pure codegen regexp chain, RE2-compatible (no lookaround), so the
    * same steps are reproducible in any engine:
    *
    *   1. drop the fragment (`#...`);
    *   2. drop tracking params (`utm_*`, `fbclid`, `gclid`) plus the
    *      separator that followed them, then mop up dangling `?`/`&`
    *      and `?&` seams;
    *   3. lowercase scheme + authority (never path/query — those are
    *      case-sensitive per RFC 3986);
    *   4. drop default ports (`:80` for http, `:443` for https);
    *   5. drop trailing slashes of the path (also when a query follows).
    */
  def normalizeUrl(u: Column): Column = {
    // 1. fragment
    val noFrag = regexp_replace(u, "#.*$", "")
    // 2. tracking params (+ trailing separator), then seam cleanup
    val noTrack = regexp_replace(noFrag,
      "(?i)(utm_[a-z0-9_]+|fbclid|gclid)=[^&#]*&?", "")
    val seam1 = regexp_replace(noTrack, "\\?&", "?")
    val seam2 = regexp_replace(seam1, "[?&]$", "")
    // 3. lowercase scheme://authority (stop at /, ? or #)
    val auth = regexp_extract(seam2, "^[^/]*//[^/?#]*", 0)
    val rest = regexp_replace(seam2, "^[^/]*//[^/?#]*", "")
    val lowered = concat(lower(auth), rest)
    // 4. default ports
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:?#]*):443([/?#]|$)", "$1$2"),
      "^(http://[^/:?#]*):80([/?#]|$)", "$1$2")
    // 5. trailing path slashes (bare "https://host/" → "https://host";
    //    ".../a/?q" → ".../a?q") — two RE2-safe replaces, no lookahead
    regexp_replace(regexp_replace(noPort, "/+\\?", "?"), "/+$", "")
  }

  /** 60-bit SimHash from a list of 32-bit token hashes (uses the low 32 of
    * each hash across 60 bit positions by re-hashing position into the
    * value; 60 not 64 so the value stays positive in signed-64 engines).
    * bit k is set iff Σ_tokens (±1 by bit k of (h·(k+1) mod p)) > 0.
    */
  def simhash60(hashes: Column): Column = {
    val p = 2147483647L
    // Bit positions unrolled Scala-side: each bit is a constant-shift
    // aggregate over the token hashes, summed as one flat expression
    // (keeps every shift amount a literal, which codegen requires).
    (0 until 60).map { k =>
      when(
        aggregate(hashes, lit(0L), (acc, h) =>
          acc + (shiftright(h * (k + 1) % p, 5) % 2L) * 2 - 1) > 0,
        lit(1L << k)).otherwise(0L)
    }.reduce(_ + _)
  }
}
