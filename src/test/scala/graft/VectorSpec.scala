package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Specs for vector similarity (SURVEY §2.12: ANN / embedding ops) and
  * the native VectorDot/VectorNorm expressions. */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 1.0f, 0.0f)),
    (4L, Array(2.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("native vec_dot matches HOF dot on real embeddings") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(50)
    val pairs = emb.select(col("embedding").as("a"))
      .crossJoin(emb.select(col("embedding").as("b")).limit(5))
    val diff = pairs.select(
      abs(call_function("vec_dot", col("a"), col("b")) -
        Similarity.dot(col("a"), col("b"))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(diff < 1e-9)
  }

  test("vec_norm matches sqrt of self-dot") {
    val got = vecs.select(
      abs(call_function("vec_norm", col("embedding")) -
        sqrt(Similarity.dot(col("embedding"), col("embedding")))).as("d"))
      .agg(max("d")).as[Double].head()
    assert(got < 1e-12)
  }

  test("cosine: parallel=1, orthogonal=0") {
    val a = typedlit(Seq(1.0f, 0.0f))
    val b = typedlit(Seq(3.0f, 0.0f))
    val c = typedlit(Seq(0.0f, 2.0f))
    val row = spark.range(1)
      .select(Similarity.cosine(a, b).as("par"), Similarity.cosine(a, c).as("ort"))
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - 1.0) < 1e-12 && math.abs(row._2) < 1e-12)
  }

  test("cosineTopK ranks nearest first, excludes self") {
    val got = Similarity.cosineTopK(
      vecs.filter(col("vec_id") === 1), vecs, "vec_id", "embedding", 2)
      .select("match_id", "rk").as[(Long, Int)].collect().toSeq
    assert(got == Seq((4L, 1), (3L, 2))) // identical direction first, 45° second
  }

  test("cosinePairsAbove finds exactly the near-parallel pair") {
    val got = Similarity.cosinePairsAbove(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 4L)))
  }

  test("ivf_cells native kernel == reference ranking, incl. codegen-hostile nCells") {
    // the r16 native expression replaced an nCells-wide
    // sort_array(array(struct(vec_dot…))) tree that fell out of
    // whole-stage codegen past ~200 cells; contract: top-n cells by
    // sim = dot/(|q|·|seed|) DESC, ties → lowest cell id, computed in
    // the same double arithmetic — checked against a plain Scala fold
    // at a codegen-friendly 16 cells AND the 224-cell regime that
    // used to break, through the DataFrame (codegen) path both times
    val rnd = new scala.util.Random(41L)
    val dim = 32
    def randVec() = Array.fill(dim)(rnd.nextFloat())
    val queries = IndexedSeq.tabulate(40)(i => (i.toLong, randVec()))
    for (nCells <- Seq(16, 224); nProbe <- Seq(1, 4)) {
      val seeds = IndexedSeq.fill(nCells)(randVec().toSeq).map(_.toSeq)
      val got = queries.toDF("id", "v")
        .select(col("id"), call_function("ivf_cells", col("v"),
          call_function("vec_norm", col("v")),
          typedLit(seeds), lit(nProbe)).as("cells"))
        .as[(Long, Seq[Int])].collect().toMap
      val sNorms = seeds.map(s => math.sqrt(s.map(x => x.toDouble * x.toDouble).sum))
      queries.foreach { case (id, q) =>
        val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
        val sims = seeds.indices.map { c =>
          val dot = q.indices.map(p => q(p).toDouble * seeds(c)(p)).sum
          (dot / (qn * sNorms(c)), c)
        }
        val want = sims.sortBy { case (s, c) => (-s, c) }.take(nProbe).map(_._2)
        assert(got(id) == want,
          s"nCells=$nCells nProbe=$nProbe query $id: ${got(id)} != $want")
      }
    }
  }

  test("ivf_cells degenerate zero-norm ranking: +Inf cells, then -Inf, then NaN") {
    // a zero `norm` operand (caller-supplied column, not necessarily
    // vec_norm) makes sims ±Inf/NaN; the old sort_array tree ordered
    // struct(negSim, cell) ascending ⇒ +Inf sims first (by id), then
    // -Inf (by id), then NaN last (by id) — the selection loop must
    // reproduce that, -Inf cells selectable BEFORE the NaN fallback
    // (ADVICE r16)
    val seeds = Seq(Seq(1.0f, 0.0f), Seq(-1.0f, 0.0f),
      Seq(0.0f, 1.0f), Seq(0.5f, 0.0f))
    val got = Seq((1L, Array(1.0f, 0.0f))).toDF("id", "v")
      .select(call_function("ivf_cells", col("v"), lit(0.0),
        typedLit(seeds), lit(4)).as("cells"))
      .as[Seq[Int]].head()
    // dots vs q=(1,0): s0=1 (+Inf), s1=-1 (-Inf), s2=0 (NaN), s3=0.5 (+Inf)
    assert(got == Seq(0, 3, 1, 2))
  }

  test("ivfCosineTopK sims agree with brute force on shared pairs") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.filter(col("vec_id") % 100 === 0)
    val brute = graft.operators.Similarity
      .cosineTopK(q, emb, "vec_id", "embedding", k = 50)
      .select("query_id", "match_id", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = graft.operators.Similarity
      .ivfCosineTopK(q, emb, "vec_id", "embedding", k = 5)
      .collect()
    assert(ivf.nonEmpty)
    // ivf candidates carry the exact cosine: any pair also in the
    // brute-force top-50 must have the identical rounded sim
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(s => assert(math.abs(s - r.getDouble(2)) < 1e-9))
    }
    // per-query cap respected
    val perQuery = ivf.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQuery.forall(_ <= 5))
  }

  test("ivfCosineTopK: unique pairs by construction, corpus never shuffled") {
    // r20 contract (replaces the r19 "dedups candidate pairs" guard):
    // every corpus row is assigned EXACTLY ONE cell, so a
    // (query_id, match_id) pair can only surface through the single
    // probed cell the match lives in — candidate pairs are unique BY
    // CONSTRUCTION and the old bare-pair distinct (a full exchange of
    // the candidate set) is gone. The corpus vectors now ride THROUGH
    // the cell join (no second corpus scan, no match_id shuffle): the
    // only shuffle left is the final per-query top-k window.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") % 100 === 0)
    val df = Similarity.ivfCosineTopK(q, emb, "vec_id", "embedding", k = 5)
    // (a) results still hold the per-pair uniqueness the distinct used
    // to enforce
    val pairs = df.select("query_id", "match_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length,
      "duplicate (query, match) pairs — single-cell assignment broken")
    // (b) no aggregation anywhere below the window (the removed
    // distinct was the only one)
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.output.map(_.name).toSet }
    assert(aggs.isEmpty, s"unexpected aggregate in the IVF path: $aggs")
    // (c) every join is a broadcast — the corpus side is never
    // exchanged (SMJ/SHJ would shuffle O(corpus) rows on match_id)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-shuffling join in the IVF query path:\n$plan")
  }

  test("ivfPqTopKEncoded: one collect serves the query side; no pair distinct") {
    // r20: the query frame is collected ONCE (it is broadcast-sized by
    // contract) and re-emitted as local relations, so the ADC chain's
    // query-side joins build from LocalTableScan instead of
    // re-executing the query subtree, and the probed-cell filter needs
    // no separate distinct+collect job. Candidate pairs are unique by
    // construction (one cell per encoded row) — no distinct exchange.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") % 100 === 0)
    val index = Similarity.fitPqIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 16, kCodes = 16, pqIters = 1)
    val enc = Similarity.encodePq(emb, "vec_id", "embedding", index)
    val df = Similarity.ivfPqTopKEncoded(qs, enc, emb, "vec_id",
      "embedding", index, k = 5)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length == pairs.distinct.length,
      "duplicate (query, match) pairs — single-cell assignment broken")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"corpus-shuffling join in the ADC query path:\n$plan")
    assert(plan.contains("LocalTableScan"),
      "query-side joins must build from the one collected artifact")
  }

  test("kmeansSeeds Lloyd rounds improve the quantizer objective") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def objective(seeds: Seq[Seq[Float]]): Double = {
      // mean cosine of each corpus row to its NEAREST centroid —
      // spherical k-means maximizes this
      val sims = emb.collect().map { r =>
        val v = r.getAs[scala.collection.Seq[Float]]("embedding").toArray
        val vn = math.sqrt(v.map(x => x.toDouble * x).sum)
        seeds.map { s =>
          val d = v.zip(s).map { case (a, b) => a.toDouble * b }.sum
          val sn = math.sqrt(s.map(x => x.toDouble * x).sum)
          d / (vn * sn)
        }.max
      }
      sims.sum / sims.length
    }
    val init = Similarity.kmeansSeeds(emb, "vec_id", "embedding", 16, iters = 0)
    val refined = Similarity.kmeansSeeds(emb, "vec_id", "embedding", 16, iters = 3)
    val (o0, o3) = (objective(init), objective(refined))
    assert(o3 >= o0 - 1e-9, s"k-means worsened the objective: $o0 -> $o3")
    assert(o3 > o0, s"3 Lloyd rounds should strictly improve here: $o0 -> $o3")
  }

  test("lshCosineTopK returns subset of brute-force ranking") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 100 === 0)
    val lsh = Similarity.lshCosineTopK(queries, emb, "vec_id", "embedding",
      k = 5, bits = 8, dim = 64, tables = 8)
    // recall<1 by construction; contract: at most k matches per query,
    // none matching itself
    val over = lsh.groupBy("query_id").count().filter(col("count") > 5).count()
    assert(over == 0)
    assert(lsh.filter(col("query_id") === col("match_id")).count() == 0)
    assert(lsh.count() > 0)
  }

  test("srp_buckets compiled kernel agrees with declarative srpBucket") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(100)
    // table t of the compiled kernel uses seed seed+t — compare each
    // against the declarative single-table form
    val tables = 3
    val rows = emb.select(
      call_function("srp_buckets", col("embedding"),
        lit(8), lit(64), lit(tables), lit(7)).as("compiled"),
      array((0 until tables).map(t =>
        Similarity.srpBucket(col("embedding"), bits = 8, dim = 64,
          seed = 7 + t)): _*).as("declarative"))
    val mismatches = rows
      .filter(col("compiled") =!= col("declarative")).count()
    assert(mismatches == 0)
  }

  /** Deterministic pseudo-random double in [-0.5, 0.5] from md5. */
  private def r(tag: String): Float = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes("UTF-8"))
    val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
    (v.toDouble / 0xffffff - 0.5).toFloat
  }

  test("lshCosineTopK recall@1 >= 0.8 on planted near-duplicates") {
    val dim = 64
    val base = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(dim)(j => r(s"b:$i:$j")))
    }
    val probes = (0 until 20).map { i =>
      (1000L + i, Array.tabulate(dim)(j =>
        base(i)._2(j) + 0.02f * r(s"p:$i:$j")))
    }
    val corpus = base.toDF("vec_id", "embedding")
    val queries = probes.toDF("vec_id", "embedding")
    val got = Similarity.lshCosineTopK(queries, corpus, "vec_id", "embedding",
      k = 1, bits = 16, dim = dim, tables = 4)
      .select("query_id", "match_id").as[(Long, Long)].collect().toMap
    val hits = (0 until 20).count(i => got.get(1000L + i).contains(i.toLong))
    assert(hits >= 16, s"recall@1 = $hits/20 — LSH parameterization lost recall")
  }

  test("pqCodebooks: training iterations reduce reconstruction error") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val rows = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    def rmse(books: Seq[Seq[Seq[Float]]]): Double = {
      val m = books.size; val sd = books.head.head.size
      val errs = rows.map { v =>
        (0 until m).map { s =>
          val sub = v.slice(s * sd, s * sd + sd)
          books(s).map(c => c.zip(sub).map { case (a, b) =>
            (a - b).toDouble * (a - b) }.sum).min
        }.sum
      }
      math.sqrt(errs.sum / errs.length)
    }
    val init = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 16, kCodes = 32, iters = 0)
    val trained = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 16, kCodes = 32, iters = 2)
    assert(init.size == 16 && init.head.size == 32 &&
      init.head.head.size == 4)
    assert(rmse(trained) < rmse(init),
      s"training failed to improve: ${rmse(trained)} !< ${rmse(init)}")
  }

  test("pqCodesExpr assigns every subvector its L2-nearest code") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(200)
    val books = Similarity.pqCodebooks(emb, "vec_id", "embedding",
      m = 8, kCodes = 16, iters = 1)
    val got = emb.select(col("embedding"),
        Similarity.pqCodesExpr(col("embedding"), books).as("codes"))
      .collect()
    got.foreach { r =>
      val v = r.getSeq[Float](0); val codes = r.getSeq[Int](1)
      assert(codes.size == 8)
      codes.zipWithIndex.foreach { case (code, s) =>
        val sub = v.slice(s * 8, s * 8 + 8)
        val dists = books(s).map(c => c.zip(sub).map { case (a, b) =>
          (a - b).toDouble * (a - b) }.sum)
        // argmin with code-asc tie-break
        assert(dists(code) == dists.min, s"sub $s: $code not argmin")
      }
    }
  }

  test("ivfPqTopK: planted neighbors recovered through the ADC path") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val qs = emb.filter(col("vec_id") % 25 === 0)
      .select((-col("vec_id") - 1).as("vec_id"),
        transform(col("embedding"),
          v => (v * 1.02d + 0.01d).cast("float")).as("embedding"))
    val ann = Similarity.ivfPqTopK(qs, emb, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4, m = 16, kCodes = 32, rerank = 4)
    val n = qs.count()
    val hits = ann.filter(col("match_id") === -col("query_id") - 1).count()
    assert(hits * 10 >= n * 8, s"IVF-PQ planted recall $hits/$n < 80%")
    // the candidate generator stays an equi-join: no quadratic plans
    val plan = ann.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("PQ index lifecycle: fit -> persist -> load -> query == fresh query") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val index = Similarity.fitPqIndex(emb, "vec_id", "embedding",
      nCells = 16, m = 16, kCodes = 32, pqIters = 1)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pq-index").toString
    Similarity.writePqIndex(spark, index, dir)
    val loaded = Similarity.readPqIndex(spark, dir)
    assert(loaded == index, "index round-trip changed the artifacts")
    // encode once, persist the compressed corpus, query from storage
    val encodedPath = s"$dir/encoded"
    Similarity.encodePq(emb, "vec_id", "embedding", loaded)
      .write.parquet(encodedPath)
    val qs = emb.filter(col("vec_id") % 25 === 0)
      .select((-col("vec_id") - 1).as("vec_id"),
        transform(col("embedding"),
          v => (v * 1.02d + 0.01d).cast("float")).as("embedding"))
    val fromDisk = Similarity.ivfPqTopKEncoded(qs,
        spark.read.parquet(encodedPath), emb, "vec_id", "embedding",
        loaded, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fresh = Similarity.ivfPqTopK(qs, emb, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4, m = 16, kCodes = 32, pqIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fromDisk == fresh && fresh.nonEmpty,
      s"persisted-index query diverged: disk=${fromDisk.size} fresh=${fresh.size}")
  }

  test("fitPqIndex's fused seed scan == the unfused kmeansSeeds + pqCodebooks") {
    // r19 opt guard: fitPqIndex collects one top-max(nCells,kCodes)
    // seed scan and slices it for both stages; the result must be
    // byte-identical to running the two stages' own seed scans.
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val fused = Similarity.fitPqIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 16, kCodes = 16, pqIters = 1)
    val unfused = Similarity.PqIndex(
      Similarity.kmeansSeeds(emb, "vec_id", "embedding", nCells = 8),
      Similarity.pqCodebooks(emb, "vec_id", "embedding", m = 16,
        kCodes = 16, iters = 1))
    assert(fused.seeds == unfused.seeds, "coarse seeds diverged")
    assert(fused.books == unfused.books, "PQ codebooks diverged")
  }

  test("semantic dedup pair join stays a label equi-join (never a BNLJ)") {
    // the SemDeDup plan contract: pairwise cosine work is confined to
    // cluster cells by a hash-joinable equality on the label — a
    // BroadcastNestedLoopJoin/CartesianProduct here would be corpus²
    val df = graft.queries.Registry.all.find(_.name == "dedup_semantic_keep")
      .get.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
