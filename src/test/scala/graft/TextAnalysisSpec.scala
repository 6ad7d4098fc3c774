package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Specs for text ops (SURVEY §2.12 north-star: tokenize, shingles,
  * fingerprint, lang-id, MinHash/SimHash dedup). */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("tokens splits on whitespace; empty → empty array") {
    val df = Seq("a  b\tc", "", "  ").toDF("text")
      .select(TextAnalysis.tokens(col("text")).as("t"))
    assert(df.as[Seq[String]].collect().toSeq ==
      Seq(Seq("a", "b", "c"), Seq(), Seq()))
  }

  test("shingles builds word n-grams; short docs → empty") {
    val got = one("the quick brown fox")
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(got == Seq("the quick brown", "quick brown fox"))
    val short = one("hi there")
      .select(TextAnalysis.shingles(col("text"), 3).as("s"))
      .as[Seq[String]].head()
    assert(short == Seq())
  }

  test("compiled WordShingles expression matches declarative shingles") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val a = docs.select(col("doc_id"),
      TextAnalysis.shingles(col("text"), 3).as("s"))
    val b = docs.select(col("doc_id"),
      call_function("shingles", TextAnalysis.tokens(col("text")), lit(3)).as("s"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq("Hello  World", "hello world").toDF("text")
      .select(TextAnalysis.fingerprint(col("text")).as("f"))
    val fs = df.as[String].collect()
    assert(fs(0) == fs(1))
  }

  test("langId picks dominant marker language") {
    val df = Seq("the cat and the dog is here",
      "der hund und die katze ist da",
      "zzz qqq").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("lang"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "und"))
  }

  test("identical docs share MinHash signature; disjoint docs do not") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val sig = Dedup.minHashSignatures(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
  }

  test("simHash of near-identical docs differs in few bits") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and once"),
      (3L, "entirely different words compose this unrelated document text"))
      .toDF("doc_id", "text")
    val h = df.select(col("doc_id"), Dedup.simHash(col("text"), 16).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(1L), h(2L)) < hamming(h(1L), h(3L)))
  }

  test("64-bit simhash band slices do not collapse (bucket cardinality)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val bits = 64; val bands = 4; val sliceBits = bits / bands
    val mask = (1L << sliceBits) - 1
    val h = docs.select(Dedup.simHash(col("text"), bits).as("sh"))
    val nHashes = h.select(countDistinct("sh")).as[Long].head()
    // each 16-bit band slice must retain most of the hash diversity —
    // the anti-collapse property 8-bit slices (256 values) lacked
    (0 until bands).foreach { b =>
      val nSlices = h.select(countDistinct(
        shiftright(col("sh"), b * sliceBits).bitwiseAND(mask))).as[Long].head()
      assert(nSlices.toDouble >= 0.5 * nHashes,
        s"band $b: $nSlices distinct slices vs $nHashes distinct hashes")
    }
  }

  test("ngramJaccardPairs hot-shingle prune kills stop-shingle blowup only") {
    // every doc shares the stop shingle "the quick fox"; docs 1/2 also
    // share rare content. With the prune, the rare-content pair
    // survives; pairs connected ONLY through the stop shingle vanish.
    val stop = "the quick fox"
    val df = (1 to 12).map {
      case 1 => (1L, s"$stop alpha beta gamma delta")
      case 2 => (2L, s"$stop alpha beta gamma epsilon")
      case i => (i.toLong, s"$stop unique$i filler$i word$i tail$i")
    }.toDF("doc_id", "text")
    val pruned = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 3, threshold = 0.05, maxShingleDf = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pruned == Set((1L, 2L)), s"got $pruned")
    // without the prune the stop shingle connects every doc pair
    val exact = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 3, threshold = 0.05)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size > 1 && exact.contains((1L, 2L)))
  }

  test("connectedComponents labels chains and keeps singleton pairs apart") {
    // chain 1-2-3-4 (diameter 3) + isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("text_normalize: NFC, lowercase, accent strip, whitespace collapse") {
    graft.functions.GraftFunctions.register(spark)
    // e + combining acute (NFD) normalizes to é then strips to e
    val got = Seq("  Héllo\t Wörld ", "Café", "")
      .toDF("t")
      .select(call_function("text_normalize", col("t")).as("n"))
      .as[String].collect().toSeq
    assert(got == Seq("hello world", "cafe", ""))
  }

  test("char_entropy: 0 for uniform-char and empty; ln 2 for a 50/50 doc") {
    graft.functions.GraftFunctions.register(spark)
    val got = Seq("aaaa", "", "abab").toDF("t")
      .select(call_function("char_entropy", col("t")).as("e"))
      .as[Double].collect().toSeq
    assert(got(0) == 0.0 && got(1) == 0.0 &&
      math.abs(got(2) - math.log(2)) < 1e-12)
  }

  test("connectedComponents == reference union-find on random graphs") {
    // seeded pseudo-random instances; reference = driver union-find
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { trial =>
      val n = 30 + trial * 20
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a == b) (a, b + 1) else (a, b)
      }
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map { x =>
        // canonical label = min node id in the component
        val root = find(x)
        x -> parent.keys.filter(find(_) == root).min
      }.toMap
      val got = Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"trial $trial mismatch")
    }
  }

  test("connectedComponents DataFrame path == union-find on random string-id graphs") {
    // same property as the RDD path, but ids are strings so the
    // DataFrame fixpoint runs; zero-padded ids keep lexicographic min
    // == numeric min so the reference is shared
    val rnd = new scala.util.Random(43)
    (1 to 2).foreach { trial =>
      val n = 25 + trial * 15
      val edges = Seq.fill(n) {
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        if (a == b) (a, b + 1) else (a, b)
      }
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      def s(x: Long) = f"n$x%03d"
      val expected = parent.keys.map { x =>
        val root = find(x)
        s(x) -> s(parent.keys.filter(find(_) == root).min)
      }.toMap
      val got = Dedup.connectedComponents(
        edges.map { case (a, b) => (s(a), s(b)) }.toDF("id_a", "id_b"),
        "id_a", "id_b")
        .as[(String, String)].collect().toMap
      assert(got == expected, s"trial $trial string-id CC mismatch")
    }
  }

  test("connectedComponents string-id fallback (DataFrame loop) labels components") {
    // non-integral ids take the DataFrame fixpoint; min-label is
    // lexicographic there ("doc1" < "doc2"; "doc10" heads its own pair)
    val pairs = Seq(("doc1", "doc2"), ("doc2", "doc3"), ("doc10", "doc11"))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(String, String)].collect().toMap
    assert(got == Map("doc1" -> "doc1", "doc2" -> "doc1", "doc3" -> "doc1",
      "doc10" -> "doc10", "doc11" -> "doc10"))
  }

  test("connectedComponents single-partition fast path == loop (r20)") {
    // a 1-partition edge list takes the in-task union-find base case
    // (no shuffle rounds); labels must match the loop's exactly, and
    // long chains converge regardless of maxIter (no fixpoint rounds)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (10L, 11L), (12L, 12L))
    val onePart = edges.toDF("id_a", "id_b").coalesce(1)
    val multi = edges.toDF("id_a", "id_b").repartition(4)
    val fast = Dedup.connectedComponents(onePart, "id_a", "id_b",
        maxIter = 1) // would throw in the loop: proves the base case ran
      .as[(Long, Long)].collect().toMap
    val loop = Dedup.connectedComponents(multi, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(fast == loop, s"fast=$fast loop=$loop")
    assert(fast(8L) == 1L && fast(11L) == 10L && fast(12L) == 12L)
  }

  test("connectedComponents refuses to return non-converged labels") {
    // a 6-node chain cannot stabilize in one round even with pointer
    // jumping; a silent exit here would corrupt canonical-doc picks
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("id_a", "id_b")
    val err = intercept[IllegalStateException] {
      Dedup.connectedComponents(pairs, "id_a", "id_b", maxIter = 1).collect()
    }
    assert(err.getMessage.contains("did not converge"))
  }

  test("minHashCandidates surfaces duplicate docs as a pair") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "unrelated totally different content here now ok yes"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minHashCandidates(df, "doc_id", "text",
      numHashes = 16, numBands = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("removeRepeatedLines keeps FIRST corpus occurrence, reassembles in order") {
    // C4 semantics: "dup" appears in docs 1 (pos 1) and 2 (pos 0) —
    // only doc 1's copy survives; unique lines all survive in order
    val df = Seq(
      (1L, Seq("alpha", "dup", "beta")),
      (2L, Seq("dup", "gamma")),
      (3L, Seq("dup"))
    ).toDF("doc_id", "lines")
    val got = Dedup.removeRepeatedLines(df, "doc_id", "lines")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 3L, "alpha\ndup\nbeta"),
      (2L, 1L, "gamma")))
    // doc 3 lost its only line → absent from the output entirely
    assert(!got.exists(_._1 == 3L))
    // within-doc repeats: the SECOND copy in the same doc is also a
    // non-first occurrence and is removed
    val within = Seq((7L, Seq("x", "x", "y"))).toDF("doc_id", "lines")
    val w = Dedup.removeRepeatedLines(within, "doc_id", "lines")
      .collect().map(r => (r.getLong(1), r.getString(2))).head
    assert(w == (2L, "x\ny"))
  }

  test("URL canonicalization: lowercase host, SURT, tracking-param and fragment drop") {
    import graft.operators.TextAnalysis
    val urls = Seq(
      "https://WWW.News.Example.COM/a/b?utm_source=x&id=7&fbclid=zz&q=2#frag",
      "https://example.com/plain",                 // no query, no www
      "http://Host.ORG/p?utm_campaign=only&gclid=1", // ONLY tracking params
      // BARE tracker keys (no '=') — shortener-stripped form must
      // canonicalize identically to the valued form
      "https://a.example.com/p?fbclid&id=3&gclid"
    ).toDF("u")
    val got = urls.select(
      TextAnalysis.urlHost(col("u")).as("host"),
      TextAnalysis.urlSurtHost(col("u")).as("surt"),
      TextAnalysis.urlCanonical(col("u")).as("canon"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("www.news.example.com", "com,example,news,www",
        "www.news.example.com/a/b?id=7&q=2"),
      ("example.com", "com,example", "example.com/plain"),
      // every param was tracking → no '?' survives
      ("host.org", "org,host", "host.org/p"),
      ("a.example.com", "com,example,a", "a.example.com/p?id=3")))
  }

  test("removeRepeatedLines fail-fasts on unusable doc ids (packed-key domain)") {
    // a string id would cast to null and silently drop the whole
    // corpus — must be rejected up front instead
    val strId = Seq(("a", Seq("x"))).toDF("doc_id", "lines")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.removeRepeatedLines(strId, "doc_id", "lines")
    }
    assert(e1.getMessage.contains("integral"))
    // an id past Long.MaxValue/2^20 would overflow docId*2^20+pos —
    // raise by name at runtime, never a silently wrong first-occurrence
    def chainMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val big = Seq((Long.MaxValue / (1 << 20) + 1, Seq("x")))
      .toDF("doc_id", "lines")
    val e2 = intercept[Exception] {
      Dedup.removeRepeatedLines(big, "doc_id", "lines").collect()
    }
    assert(chainMsg(e2).contains("overflow"), chainMsg(e2))
    // ... and a negative id breaks min-packing order the same way
    val neg = Seq((-1L, Seq("x"))).toDF("doc_id", "lines")
    val e3 = intercept[Exception] {
      Dedup.removeRepeatedLines(neg, "doc_id", "lines").collect()
    }
    assert(chainMsg(e3).contains("overflow"), chainMsg(e3))
  }

  test("Bpe.train learns the textbook merges; encode applies them in rank order") {
    import graft.functions.Bpe
    // Sennrich's classic corpus shape: 'lo' dominates, then 'low'
    val hist = Seq(("low", 5L), ("lower", 2L), ("lowest", 6L), ("newer", 3L))
    val merges = Bpe.train(hist, 3)
    // pair counts round 1: (l,o)=13, (o,w)=13, (w,e)=11, (e,r)=5, ...
    // tie (l,o) vs (o,w) breaks lexicographically → ("l","o") first,
    // after which ("lo","w")=13 dominates
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")), merges.toString)
    val ranks = Bpe.ranksOf(merges)
    assert(Bpe.encode("low", ranks).toSeq == Seq("low") ||
      Bpe.encode("low", ranks).mkString("") == "low")
    // an unseen word still round-trips from pieces
    assert(Bpe.encode("slowly", ranks).mkString("") == "slowly")
    // surrogate pairs never split: emoji stay whole symbols
    val emoji = "a😀b"
    assert(Bpe.encode(emoji, Bpe.ranksOf(Seq.empty)).toSeq ==
      Seq("a", "😀", "b"))
  }

  test("Bpe: more merges never increase the corpus subword count; fit is deterministic") {
    import graft.functions.Bpe
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(length(trim(col("text"))) > 0 && col("doc_id") % 3 === 0)
    val m50 = Bpe.fitMerges(docs, "text", nMerges = 50)
    val m200 = Bpe.fitMerges(docs, "text", nMerges = 200)
    assert(m200.take(m50.size) == m50) // prefix-stable: same greedy path
    assert(m200 == Bpe.fitMerges(docs, "text", nMerges = 200)) // deterministic
    def subwords(merges: Seq[(String, String)]): Long = {
      val ranks = Bpe.ranksOf(merges)
      docs.select(graft.operators.TextAnalysis.tokens(col("text")).as("t"))
        .collect().map(_.getSeq[String](0))
        .map(_.map(w => Bpe.encode(w, ranks).length.toLong).sum).sum
    }
    val s0 = subwords(Seq.empty)
    val s50 = subwords(m50)
    val s200 = subwords(m200)
    assert(s50 < s0, s"50 merges should compress: $s50 !< $s0")
    assert(s200 <= s50, s"$s200 !<= $s50")
  }
}
