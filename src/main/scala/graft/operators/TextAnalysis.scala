package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * Capability parity targets: Beam's `Regex` family
  * (reference: sdks/java/core/.../transforms/Regex.java:44), RAG chunking
  * (sdks/python/apache_beam/ml/rag/chunking/base.py) and the ML
  * preprocessing surface (ml/transforms/base.py:298) — re-expressed as
  * pure Catalyst column expressions so everything stays inside
  * whole-stage codegen: no UDFs, no shuffles, linear scans that
  * trivially scale to 100 TB (per-row work only).
  */
object TextAnalysis {

  /** Whitespace tokenization; empty string → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Word n-gram shingles (space-joined), e.g. for MinHash / Jaccard.
    * Implemented with `transform` over token indices — codegen'd, no UDF.
    *
    * PERFORMANCE TRAP: the `get(toks, i+j)` references inside the
    * lambda each re-evaluate the `split` child PER ELEMENT (Catalyst
    * inlines it; no CSE across lambda invocations), so this is
    * O(tokens²) regex work per row. For hot paths use the compiled
    * `call_function("shingles", tokens(text), lit(n))` expression
    * (functions/TextHashExprs.scala WordShingles) — measured 12× on
    * the corpus queries. This HOF form stays as the no-registration
    * fallback for ad-hoc use.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val count = size(toks) - (n - 1)
    // guard: sequence(0, -1) would produce a DESCENDING array in Spark,
    // so short docs must short-circuit to an empty shingle list.
    when(count <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", (0 until n).map(j => get(toks, i + j)): _*)))
  }

  /** Normalized-text fingerprint (lowercase, collapsed whitespace → md5).
    * Beam analog: deterministic representative keys for Distinct
    * (transforms/Distinct.java:67 withRepresentativeValueFn).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Rolling 60-bit content hash (portable across engines). */
  def fingerprint64(text: Column): Column =
    PortableHash.md5Long(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Heuristic quality score in [0,1]: rewards mid-length docs, prose-like
    * punctuation density and a healthy stopword ratio. All arithmetic is
    * deterministic (no fp-order dependence: per-row only). */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val avgWordLen = when(nTokens > 0, nChars / nTokens).otherwise(lit(0.0))
    val punct = (length(text) -
      length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val stop = stopwordCount(text).cast("double")
    val stopRatio = when(nTokens > 0, stop / nTokens).otherwise(lit(0.0))
    val lenScore = least(nTokens / lit(50.0), lit(1.0))
    val wordLenScore =
      when(avgWordLen >= 3 && avgWordLen <= 10, lit(1.0)).otherwise(lit(0.5))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    round(lenScore * 0.4 + wordLenScore * 0.3 + stopScore * 0.2 +
      least(punctRatio * 10.0, lit(1.0)) * 0.1, 6)
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Count of English stopword tokens (word-boundary matches). */
  def stopwordCount(text: Column): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => EnglishStopwords.foldLeft(lit(false))((acc, w) => acc || (t === w))))
  }

  /** Tiny n-gram/stopword language-ID heuristic: scores each candidate
    * language by marker-token hits and returns the argmax (ties → "und").
    * Marker lists are deliberately minimal and deterministic so an
    * external SQL oracle can reproduce the exact output. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "de", "que", "es"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val toks = tokens(lower(text))
    size(filter(toks, t => markers.foldLeft(lit(false))((acc, w) => acc || (t === w))))
  }

  def langId(text: Column): Column = {
    val scored = LangMarkers.map { case (lang, ms) => (lang, langScore(text, ms)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    // first language (in declared order) achieving the max, if max > 0
    scored.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  // ---- URL canonicalization (web-corpus curation: per-URL dedup and
  // host-level grouping need one canonical form per page — CommonCrawl
  // tooling's normalize+SURT pass). All native parse_url / HOF
  // expressions: whole-stage codegen, zero shuffle. ----

  /** Lowercased host of a URL (parse_url HOST). */
  def urlHost(u: Column): Column = lower(parse_url(u, lit("HOST")))

  /** SURT-style reversed host — `www.a.example.com` →
    * `com,example,a,www` — the key web archives sort/group on so one
    * site's pages cluster in ONE range at 100 TB (host-hash grouping
    * scatters them). */
  def urlSurtHost(u: Column): Column =
    array_join(reverse(split(urlHost(u), "\\.")), ",")

  /** Query string with tracking params (utm_*, fbclid, gclid) dropped
    * — bare keys too (`?fbclid` without `=`, common after shortener
    * stripping, must canonicalize the same as `?fbclid=x` or the same
    * page gets two identities); NULL when nothing survives. Param
    * order is preserved. */
  def urlCleanQuery(u: Column): Column = {
    val kept = filter(split(parse_url(u, lit("QUERY")), "&"),
      p => {
        val key = element_at(split(p, "=", 2), 1)
        !(key.startsWith("utm_") || key === "fbclid" || key === "gclid")
      })
    when(parse_url(u, lit("QUERY")).isNull || size(kept) === 0, lit(null))
      .otherwise(array_join(kept, "&"))
  }

  /** Canonical page identity: lowercase host + path + surviving query,
    * fragment dropped — the string to exact-dedup on. */
  def urlCanonical(u: Column): Column = {
    val q = urlCleanQuery(u)
    concat(urlHost(u), parse_url(u, lit("PATH")),
      when(q.isNull, lit("")).otherwise(concat(lit("?"), q)))
  }
}
