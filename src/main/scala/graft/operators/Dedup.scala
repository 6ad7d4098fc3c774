package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Deduplication operators — exact and near-duplicate — designed for
  * 100 TB corpora.
  *
  * Beam surface being matched: `Distinct` (+ representative values)
  * (reference: sdks/java/core/.../transforms/Distinct.java:67),
  * `Deduplicate` (transforms/Deduplicate.java:70), plus the near-dedup
  * capability a training-data pipeline needs (MinHash/LSH, SimHash,
  * n-gram Jaccard).
  *
  * Scale notes:
  *  - exact dedup = one hash-partitioned shuffle on the key (map-side
  *    partial aggregation lifts most of the volume before the exchange);
  *  - MinHash/LSH turns O(n²) pair enumeration into an equi-join on band
  *    buckets — the only quadratic work left is within buckets;
  *  - all hashes come from [[PortableHash]] so every stage is verifiable
  *    against an external SQL oracle.
  */
object Dedup {

  /** Exact dedup keeping the smallest tie-break value per key group.
    * Deterministic (unlike `dropDuplicates`, whose survivor depends on
    * partition order — fine for semantics, wrong for golden tests).
    *
    * WINDOW form: the whole row payload crosses ONE exchange and there
    * is no map-side combine — fine when the payload is narrow or most
    * keys are unique anyway. At 100 TB with heavy duplication prefer
    * [[exactByKeyAgg]], which partial-aggregates (each map task ships
    * one candidate row per key).
    */
  def exactByKey(df: DataFrame, keys: Seq[String], tieBreak: Column*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** [[exactByKey]] as a partial-aggregating plan: `min_by(struct(*),
    * struct(tieBreak…))` per key. Each map task folds its rows down to
    * ONE surviving candidate per key BEFORE the exchange, so only
    * |keys| × partials rows cross the wire — the scale form SCALE.md §2
    * describes. Same keep-smallest contract as the window form with
    * ascending sort orders; `tieBreak` here takes plain VALUE columns
    * (struct ordering is ascending — use the window form for
    * descending/null-ordering variants). Among exact tie-break TIES the
    * survivor is arbitrary in both forms (row_number's order among
    * equal sort keys is partition-dependent, min_by picks either), so
    * pass a total-order tieBreak when golden stability matters. */
  def exactByKeyAgg(df: DataFrame, keys: Seq[String], tieBreak: Column*): DataFrame = {
    val cols = df.columns.toSeq
    df.groupBy(keys.map(col): _*)
      .agg(min_by(struct(cols.map(col): _*), struct(tieBreak: _*)).as("__keep"))
      .select(cols.map(c => col("__keep").getField(c).as(c)): _*)
  }

  /** C4's repeated-span removal (Raffel et al. 2020 §2.2, built as a
    * Beam pipeline in TFDS `c4.py`'s `remove_duplicate_text`): across
    * the WHOLE corpus, keep only the FIRST occurrence of every line /
    * span, then reassemble each document from its surviving lines in
    * original order. A line that occurs once keeps its only occurrence;
    * a duplicated line survives solely at the smallest (doc, position).
    *
    * Input: `linesCol` is an `array<string>` of the document's spans in
    * order (the caller frames them — newline split, sentence split, or
    * fixed word windows). Output: one row per doc that kept ≥1 line,
    * with `n_kept` and the reassembled `clean_text`.
    *
    * Scale: one posexplode (no shuffle), ONE exchange on the line value
    * (window min — the same GroupByKey-on-span C4's Beam job performs),
    * one exchange on the doc key to reassemble. First-occurrence order
    * is encoded as docId·2^20 + pos, so docs are capped at 2^20 lines
    * (enforced) and doc ids at ~2^43 — a 100 TB corpus keyed by
    * sequential ids fits; re-key larger id spaces first. */
  def removeRepeatedLines(df: DataFrame, docIdCol: String, linesCol: String,
      sep: String = "\n"): DataFrame = {
    val MaxLines = 1 << 20
    // the first-occurrence key is docId·2^20 + pos: a non-integral id
    // would cast to null (silently emptying the output) and an id past
    // Long.MaxValue/2^20 would overflow — fail fast on both
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    df.schema(docIdCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"removeRepeatedLines: $docIdCol must be an integral type " +
          s"(the doc id is packed into a Long first-occurrence key), " +
          s"got $other — re-key the corpus first")
    }
    val MaxDocId = Long.MaxValue / MaxLines // ~2^43
    val exploded = df
      .select(col(docIdCol), posexplode(col(linesCol)).as(Seq("pos", "line")))
      .withColumn("pos", when(col("pos") < MaxLines, col("pos"))
        .otherwise(raise_error(concat(lit(
          s"removeRepeatedLines: document exceeds $MaxLines lines: doc "),
          col(docIdCol).cast("string")))))
      .withColumn("pos", when(
        col(docIdCol) >= 0 && col(docIdCol) <= MaxDocId, col("pos"))
        .otherwise(raise_error(concat(lit(
          s"removeRepeatedLines: doc id outside [0, $MaxDocId] would " +
            "overflow the packed occurrence key: "),
          col(docIdCol).cast("string")))))
    val w = Window.partitionBy("line")
    val occ = col(docIdCol).cast("long") * MaxLines + col("pos")
    exploded
      .withColumn("first_occ", min(occ).over(w))
      .filter(occ === col("first_occ"))
      .groupBy(col(docIdCol))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), sep).as("clean_text"))
  }

  /** 2^61 - 1: modulus of the affine MinHash family (fits DuckDB's
    * overflow-checked BIGINT arithmetic: a·h31 + b < 2^62). */
  val MinHashPrime: Long = 2305843009213693951L

  /** Member i of the affine hash family h_i(x) = (a_i·x + b_i) mod P,
    * with a_i, b_i 31-bit splitmix-derived constants (a_i odd). Shared
    * with the DuckDB oracle via TextQueries. */
  def affineParams(i: Int): (Long, Long) = {
    val a = ((((i + 1).toLong * 0x9E3779B97F4A7C15L) >>> 33) & 0x7FFFFFFFL) | 1L
    val b = (((i + 1).toLong * 0xC2B2AE3D27D4EB4FL) >>> 33) & 0x7FFFFFFFL
    (a, b)
  }

  /** MinHash signature matrix: one row per doc, `numHashes` minima over
    * word `shingleSize`-gram shingles. Pure column expressions
    * (explode-free: array `transform` + `array_min`), so it is a single
    * narrow projection — no shuffle at all.
    *
    * Each shingle is md5-hashed ONCE (staged projection, kept out of
    * the signature columns so Catalyst cannot inline it 16×), then the
    * `numHashes` family members are cheap affine maps of that base hash
    * — this keeps generated code small (fast Janino compile) and the
    * per-row cost at one digest per shingle instead of `numHashes`. */
  def minHashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, shingleSize: Int = 3): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    // The shingle→md5→affine→min pipeline runs in one compiled loop per
    // row ([[graft.functions.MinHashSignature]]): Spark HOF lambdas are
    // interpreted per element, which cost ~60µs/shingle here. Docs
    // shorter than the shingle size have no signature (null → filtered;
    // matches the oracle, which has no shingle rows for them).
    val staged = df.select(col(idCol),
      call_function("minhash_sig", TextAnalysis.tokens(col(textCol)),
        lit(shingleSize), lit(numHashes)).as("__sig"))
      .filter(col("__sig").isNotNull)
    val sigCols = (0 until numHashes).map(i =>
      element_at(col("__sig"), i + 1).as(s"h$i"))
    staged.select((col(idCol) +: sigCols): _*)
  }

  /** LSH band buckets from a signature frame produced by
    * [[minHashSignatures]]: `numBands` rows per doc keyed by
    * (band, bucket-hash). Docs sharing any bucket are candidate pairs. */
  def minHashBuckets(sig: DataFrame, idCol: String, numHashes: Int,
      numBands: Int): DataFrame = {
    require(numHashes % numBands == 0)
    val rowsPerBand = numHashes / numBands
    val bands = (0 until numBands).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), md5(concat_ws("_", cols: _*)).as("bucket"))
    }
    sig.select(col(idCol), explode(array(bands: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bucket"))
  }

  /** Candidate near-dup pairs via MinHash LSH: equi-join on band buckets,
    * then estimate Jaccard as fraction of agreeing signature components.
    * Returns (idA, idB, est_jaccard) with idA < idB, deduplicated across
    * bands. The join is a plain shuffle-hash equi-join on the bucket key
    * — linear in candidates, never materializes the O(n²) pair space.
    *
    * @param maxBucket when > 0, drop band buckets holding more than
    *        this many docs BEFORE the self-join (the hot-bucket cap,
    *        same trade as [[simHashPairs]]' — r19): a bucket of size s
    *        emits s·(s−1)/2 candidates, so one degenerate bucket
    *        (boilerplate-heavy shingles, near-empty docs) is locally
    *        quadratic at any corpus size. The trade is RECALL on
    *        exactly the docs sharing that degenerate signature slice —
    *        typically template boilerplate a curation pipeline wants
    *        length/repetition filters to handle anyway; ScaleProbe's
    *        dedup_pipeline section measures the occupancy the cap
    *        would act on (p99 ~1 on non-degenerate corpora). */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, numBands: Int = 4,
      minEstJaccard: Double = 0.0, maxBucket: Long = 0L): DataFrame = {
    val sig = minHashSignatures(df, idCol, textCol, numHashes).cache()
    val buckets0 = minHashBuckets(sig, idCol, numHashes, numBands)
    val buckets =
      if (maxBucket <= 0) buckets0
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bucket"))
        buckets0.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      }
    val a = buckets.as("a")
    val b = buckets.as("b")
    val pairs = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
    val sigA = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == idCol) "id_a" else s"a_$c"): _*)
    val sigB = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == idCol) "id_b" else s"b_$c"): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"a_h$i") === col(s"b_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(sigA, "id_a").join(sigB, "id_b")
      .select(col("id_a"), col("id_b"),
        round(agree.cast("double") / numHashes, 6).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** Ingestion ADMISSION filter — the crawl gate of a training
    * pipeline: drop incoming docs that are VERIFIED MinHash
    * near-duplicates of an existing corpus, admit the rest.
    *
    * `corpusSig` is the corpus's signature frame
    * ([[minHashSignatures]]) — the INDEX: computed once, reused across
    * calls (pair this per-batch core with `foreachBatch` to gate an
    * unbounded stream; the core itself is batch-testable and
    * batch ≡ stream by construction). Candidates come from an LSH band
    * equi-join batch × corpus — never a cross product — and every
    * candidate is verified by signature agreement before dropping, so
    * band collisions alone never reject a doc. Docs too short to have
    * a signature are trivially novel (admitted). */
  def admitNovel(batch: DataFrame, corpusSig: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 16, numBands: Int = 4,
      minEstJaccard: Double = 0.5,
      corpusBuckets: Option[DataFrame] = None): DataFrame = {
    val bSig = minHashSignatures(batch, idCol, textCol, numHashes)
    val bB = minHashBuckets(bSig, idCol, numHashes, numBands)
    // For a standing stream gate, pass corpusBuckets =
    // minHashBuckets(corpusSig, …) PERSISTED once: otherwise every call
    // re-derives the band projection over the whole corpus frame and
    // per-batch work is O(corpus), not O(batch).
    val cB = corpusBuckets
      .getOrElse(minHashBuckets(corpusSig, idCol, numHashes, numBands))
      .withColumnRenamed(idCol, "__cid")
    val cand = bB.join(cB, Seq("band", "bucket"))
      .select(col(idCol), col("__cid")).distinct()
    val sigB = bSig.toDF(bSig.columns.toIndexedSeq
      .map(c => if (c == idCol) idCol else s"b_$c"): _*)
    val sigC = corpusSig.toDF(corpusSig.columns.toIndexedSeq
      .map(c => if (c == idCol) "__cid" else s"c_$c"): _*)
    val agree = (0 until numHashes)
      .map(i => when(col(s"b_h$i") === col(s"c_h$i"), 1).otherwise(0))
      .reduce(_ + _)
    val dupIds = cand.join(sigB, idCol).join(sigC, "__cid")
      .filter(agree.cast("double") / numHashes >= minEstJaccard)
      .select(idCol).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /** EMBEDDING-level ingestion admission — the online form of semantic
    * dedup (SemDeDup at the crawl gate): drop incoming rows whose
    * embedding has a near-duplicate (exact cosine ≥ `minSim` after the
    * bounded re-rank) in the INDEXED corpus, admit the rest.
    *
    * The corpus rides as the persisted IVF-PQ artifacts — the
    * [[Similarity.PqIndex]] (a few KB, [[Similarity.readPqIndex]]) plus
    * the [[Similarity.encodePq]] table (m bytes + cell + norm per row)
    * — so per-batch work is O(batch · probed-cell candidates), never
    * O(corpus), and only the bounded shortlist ever touches raw corpus
    * vectors. Pair with `foreachBatch` to gate an unbounded stream
    * (batch ≡ stream by construction; the index artifacts are loaded
    * once outside the loop).
    *
    * Admission is decision-robust even though ANN is approximate when
    * duplicates are true copies/near-copies: such a query ranks its
    * original's cell first and the original survives every shortlist
    * cut, so real duplicates are always verified by exact cosine;
    * a candidate below `minSim` can only be admitted. */
  def admitNovelByEmbedding(batch: DataFrame, encoded: DataFrame,
      corpusVecs: DataFrame, idCol: String, vecCol: String,
      index: Similarity.PqIndex, minSim: Double, nProbe: Int = 4,
      rerank: Int = 4): DataFrame = {
    // an EMPTY corpus (no fitted index) can hold no duplicate of
    // anything — everything is novel, not an error
    if (index.isEmpty) return batch
    // excludeSelf=false: an incoming row re-ingested under its corpus
    // duplicate's OWN id (the common re-fetch case) must still match it
    val nn = Similarity.ivfPqTopKEncoded(
      batch.select(col(idCol), col(vecCol)), encoded, corpusVecs,
      idCol, vecCol, index, k = 1, nProbe = nProbe, rerank = rerank,
      excludeSelf = false)
    val dupIds = nn.filter(col("sim") >= minSim)
      .select(col("query_id").as(idCol)).distinct()
    batch.join(dupIds, Seq(idCol), "left_anti")
  }

  /** SimHash over whitespace tokens using `bits` bits (≤ 64) of the
    * signed 64-bit md5 token hash. Per-bit majority vote; one narrow
    * projection through the compiled [[graft.functions.SimHash]] loop.
    * Caller must have a session with GraftFunctions registered (any
    * graft operator entry point does this). */
  def simHash(text: Column, bits: Int = 64): Column =
    call_function("simhash", TextAnalysis.tokens(text), lit(bits))

  /** SimHash near-duplicate pairs within a Hamming-distance radius,
    * banded for scale: the `bits`-bit simhash splits into `bands`
    * equal slices; by pigeonhole, two hashes within Hamming distance
    * `maxHamming` < `bands` must agree on at least one whole band —
    * so candidate generation is an equi-join on (band, slice value),
    * never the O(n²) pair space. Exact Hamming filter afterwards.
    * Requires maxHamming < bands for completeness (no missed pairs).
    *
    * Defaults (64-bit hash, 4 bands) give 16-bit slices — 65536 bucket
    * values per band, the cardinality that keeps within-bucket joins
    * tractable at 10^9 documents (8-bit slices collapse to 256 buckets
    * and go quadratic).
    *
    * @param maxBucket when > 0, drop band buckets holding more than
    *   this many docs before the self-join — a deliberate recall trade:
    *   a pathological bucket (e.g. every empty doc hashing to 0) would
    *   otherwise do |bucket|² work. Capped buckets can only MISS pairs,
    *   never invent them; 0 keeps exact pigeonhole completeness. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      bits: Int = 64, bands: Int = 4, maxHamming: Int = 3,
      maxBucket: Long = 0L): DataFrame = {
    require(maxHamming < bands,
      "pigeonhole completeness needs maxHamming < bands")
    require(bits % bands == 0)
    graft.functions.GraftFunctions.register(df.sparkSession)
    val sliceBits = bits / bands
    val mask = if (sliceBits == 64) -1L else (1L << sliceBits) - 1
    val h = df.select(col(idCol).as("id"), simHash(col(textCol), bits).as("sh"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * sliceBits).bitwiseAND(mask).as("bv"))
    }
    val banded0 = h.select(col("id"), col("sh"),
      explode(array(bandCols: _*)).as("bb"))
    val banded =
      if (maxBucket <= 0) banded0
      else {
        val w = Window.partitionBy(col("bb"))
        banded0.withColumn("__bn", count(lit(1)).over(w))
          .filter(col("__bn") <= maxBucket).drop("__bn")
      }
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.bb") === col("b.bb") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
    pairs
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Connected components over a near-duplicate PAIR graph — the step
    * after candidate generation in every dedup pipeline: pairs →
    * clusters → one canonical doc per cluster. Min-label propagation
    * with POINTER JUMPING: each round a node takes the minimum of its
    * own label, its neighbours' labels (one-hop propagation), and its
    * label's label (doubling the propagation distance — the classic
    * pointer-jump), so convergence needs O(log diameter) rounds, not
    * O(diameter). Converged when no label changes; `maxIter` is a
    * pathological-graph backstop.
    *
    * This is the ONE deliberate RDD loop in the engine (integral-id
    * inputs; a DataFrame loop below covers other id types). An
    * iterative fixpoint is where Catalyst's economics invert: the
    * DataFrame form re-analyzes, re-optimizes and re-codegens the
    * 3-way-union plan EVERY round (~0.23s/round measured vs 0.12s of
    * actual work at sf0.1), and because each round's output is a fresh
    * checkpoint whose partitioning Catalyst cannot see, it reshuffles
    * BOTH join sides every round. The RDD loop pins one
    * HashPartitioner across all rounds (the GraphX/Pregel design), so:
    *
    *  - `edges ⋈ labels` is narrow (both sides co-partitioned) — zero
    *    exchange;
    *  - the merge of propagated labels back into `labels` is a narrow
    *    equi-join on co-partitioned sides — zero exchange;
    *  - the ONLY per-round exchange is the propagation traffic itself
    *    (one reduceByKey of the update messages), which is the
    *    information-theoretic minimum for label propagation;
    *  - per-round driver cost is one job with no planning.
    *
    * The partitioner is sized to the graph (~250k edges/partition,
    * capped at the session shuffle width): a 6.7k-edge sf0.1 graph
    * runs single-partition rounds with no scheduling overhead, a
    * billion-edge 100 TB graph runs at full cluster width. Duplicate
    * input pairs are harmless (min is idempotent), so no up-front
    * distinct pass is spent on them.
    *
    * Returns (id, cluster) where cluster = min id in the component —
    * `cluster` is the canonical keeper under keep-smallest. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 15): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = pairs.schema(aCol).dataType
    val integral = Seq(ByteType, ShortType, IntegerType, LongType).contains(idType)
    if (integral) connectedComponentsRdd(pairs, aCol, bCol, maxIter)
    else connectedComponentsDf(pairs, aCol, bCol, maxIter)
  }

  /** The pinned-partitioner RDD fixpoint — see [[connectedComponents]]. */
  private def connectedComponentsRdd(pairs: DataFrame, aCol: String,
      bCol: String, maxIter: Int): DataFrame = {
    import org.apache.spark.HashPartitioner
    import org.apache.spark.storage.StorageLevel
    val spark = pairs.sparkSession
    val idType = pairs.schema(aCol).dataType
    val raw = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))
    // Partitioner sized from the UPSTREAM partition count (r19 opt,
    // guide §1.2 "remove unnecessary passes"): the old exact
    // pairCount sizing spent a full count() job + a persist pass on
    // `raw` before any CC work. Upstream partitions are a
    // size-proportional proxy at any scale, without materializing the
    // edge list twice. ASSUMES AQE (the engine default, and every
    // session this engine builds): coalescing shrinks a tiny graph's
    // candidate-join output to ~advisory-sized partitions, so small
    // graphs run narrow and a billion-edge graph runs at session
    // width. With AQE off the proxy degrades to session width — still
    // correct (any HashPartitioner width is), just not
    // size-proportional (ADVICE r19).
    val sessionParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val nPart = math.max(1,
      math.min(sessionParts, raw.getNumPartitions))
    // SINGLE-PARTITION fast path (r20 opt, guide §1.2/§2.4): when the
    // edge list has already been AQE-coalesced into ONE partition —
    // i.e. the whole graph is advisory-partition-sized — the
    // distributed fixpoint degenerates to 5-8 jobs of 1-task shuffle
    // rounds whose wall is pure scheduling latency (measured r20:
    // ~0.8 s of dedup_clusters' 1.5 s at sf0.1 for a 6.7k-edge
    // graph). Run the textbook local base case instead: union-find
    // (by-min roots + path halving) INSIDE that one task — executor-
    // side, one job, one stage, no driver collect. Identical output:
    // every node labeled with its component's min id. Any multi-
    // partition graph takes the pinned-partitioner loop below.
    if (nPart == 1) {
      val labels = raw.mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x0: Long): Long = {
          var x = x0
          var p = parent.getOrDefault(x, x)
          while (p != x) { // path halving
            val gp = parent.getOrDefault(p, p)
            parent.put(x, gp)
            x = gp
            p = parent.getOrDefault(x, x)
          }
          x
        }
        it.foreach { case (a, b) =>
          parent.putIfAbsent(a, a)
          parent.putIfAbsent(b, b)
          val ra = find(a)
          val rb = find(b)
          // union by MIN: the surviving root is the component minimum,
          // so final find(x) IS the keep-smallest cluster id
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        import scala.jdk.CollectionConverters._
        parent.keySet().asScala.toSeq.sorted.iterator
          .map(id => (id, find(id)))
      }
      return spark.createDataFrame(
        labels.map { case (id, cl) => org.apache.spark.sql.Row(id, cl) },
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("cluster",
            org.apache.spark.sql.types.LongType, nullable = false))))
        .select(col("id").cast(idType).as("id"),
          col("cluster").cast(idType).as("cluster"))
    }
    val part = new HashPartitioner(nPart)
    // symmetrized edges, co-partitioned by src for the whole loop
    val edges = raw.flatMap { case (a, b) => Iterator((a, b), (b, a)) }
      .partitionBy(part).persist(StorageLevel.MEMORY_AND_DISK)
    // Seed labels with min(id, min neighbor) — the first one-hop
    // propagation folded into initialization. reduceByKey over the
    // co-partitioned edges is map-side only: no exchange.
    var labels = edges.reduceByKey(part, math.min(_, _))
      .mapPartitions(_.map { case (id, mn) => (id, math.min(id, mn)) },
        preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // Convergence via the LABEL SUM: labels only ever decrease (each
    // round takes a min over a set containing the current label), so
    // the sum is strictly monotone and "sum unchanged" ⇔ "no label
    // changed" — one aggregate action per round, no old-vs-new join.
    // BigInt: exact for any sum of 63-bit ids.
    def labelSum(r: org.apache.spark.rdd.RDD[(Long, Long)]): BigInt =
      r.aggregate(BigInt(0))((acc, kv) => acc + kv._2, _ + _)
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // neighbour labels: narrow join (both sides on `part`), then the
      // propagation exchange — each edge sends its src's label to dst
      val viaEdges = edges.join(labels, part)
        .map { case (_, (dst, lbl)) => (dst, lbl) }
      // pointer jump: label(label(id)) — re-key by label (the one
      // genuinely new key), narrow against labels on the right
      val viaPointer = labels.map { case (id, lbl) => (lbl, id) }
        .join(labels, part)
        .map { case (_, (id, jump)) => (id, jump) }
      // ONE exchange merges all update messages; the merge back into
      // `labels` is narrow (update keys cover every node — symmetric
      // edges mean every node receives at least its own neighbourhood)
      val updates = viaEdges.union(viaPointer).reduceByKey(part, math.min(_, _))
      val newLabels = updates.join(labels, part)
        .mapPartitions(_.map { case (id, (u, old)) => (id, math.min(u, old)) },
          preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val newSum = labelSum(newLabels)
      labels.unpersist(blocking = false)
      labels = newLabels
      converged = newSum == prevSum
      prevSum = newSum
      i += 1
    }
    edges.unpersist(blocking = false)
    // A silent non-converged exit would hand back wrong cluster ids
    // (and corrupt canonical-doc selection downstream) with no signal.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(labels still changing); raise maxIter — pointer jumping " +
          "needs ~log2(graph diameter) rounds")
    labels.localCheckpoint() // truncate the loop lineage before handoff
    spark.createDataFrame(labels.map { case (id, cl) => org.apache.spark.sql.Row(id, cl) },
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cluster", org.apache.spark.sql.types.LongType, nullable = false))))
      .select(col("id").cast(idType).as("id"), col("cluster").cast(idType).as("cluster"))
  }

  /** DataFrame fixpoint for non-integral id types (string keys etc.):
    * same algorithm; per-round localCheckpoint truncates lineage (the
    * pointer-jump references `labels` three times, so an un-truncated
    * plan grows 3^n and analysis itself becomes the bottleneck). */
  private def connectedComponentsDf(pairs: DataFrame, aCol: String,
      bCol: String, maxIter: Int): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct().cache()
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint()
    // Convergence: count of labels that changed this round (string
    // labels have no monotone sum) — one join per round.
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "dst")
          .withColumnRenamed("label", "nbr_label"), Seq("dst"))
        .select(col("src").as("id"), col("nbr_label").as("label"))
      val viaPointer = labels.as("a")
        .join(labels.select(col("id").as("label"),
          col("label").as("jump")), Seq("label"))
        .select(col("id"), col("jump").as("label"))
      val prev = labels
      labels = viaEdges.union(viaPointer).union(labels)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint(eager = false)
      val changed = labels.as("n")
        .join(prev.withColumnRenamed("label", "old"), Seq("id"))
        .filter(col("label") =!= col("old")).count()
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(labels still changing); raise maxIter — pointer jumping " +
          "needs ~log2(graph diameter) rounds")
    labels.select(col("id"), col("label").as("cluster"))
  }

  /** Exact n-gram Jaccard similarity pairs above a threshold, via
    * shingle inverted index: explode distinct shingles, self-join on
    * shingle, count intersections, compute |A∩B| / (|A|+|B|-|A∩B|).
    * One shuffle on the shingle key + one on the pair key.
    *
    * @param maxShingleDf when > 0, shingles appearing in more than this
    *   many documents are PRUNED from the index before the self-join —
    *   the hot-shingle fix for the quadratic stop-shingle blowup (a
    *   shingle in k docs contributes k² candidate rows; frequency-prune
    *   caps that at maxShingleDf² per shingle). Jaccard is then
    *   computed over the pruned shingle universe (sizes and
    *   intersections consistently exclude hot shingles) — the standard
    *   web-dedup approximation; 0 keeps the exact measure. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.1,
      maxShingleDf: Long = 0L): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    val shAll = df.select(col(idCol).as("id"),
      explode(array_distinct(call_function("shingles",
        TextAnalysis.tokens(col(textCol)), lit(n)))).as("sh"))
    val sh =
      if (maxShingleDf <= 0) shAll
      else {
        val hot = shAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > maxShingleDf).select("sh")
        shAll.join(broadcast(hot), Seq("sh"), "left_anti")
      }
    val sizes = sh.groupBy("id").agg(count("*").as("sz"))
    val inter = sh.as("x").join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count("*").as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
