package graft

import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LocalRelation, LogicalPlan, Window}

import graft.queries.Registry

/** Automated scale lint over EVERY registry query's optimized plan —
  * the generalization of ScaleSpec's hand-written plan guards. At
  * 100 TB the three shapes below are the classic job-killers; each
  * query either avoids them or appears in an allowlist that documents
  * WHY its occurrence is bounded:
  *
  *  1. GLOBAL WINDOW — a logical `Window` with an empty partitionSpec
  *     funnels the whole input through one task.
  *  2. UNBOUNDED CROSS JOIN — a condition-less `Join` where neither
  *     side is provably tiny (fit artifacts aggregate to ≤1 row, which
  *     `maxRows` proves; LocalRelations are literal data).
  *  3. NON-EQUI JOIN OVER UNBOUNDED SIDES — a joined condition with no
  *     equality lowers to BroadcastNestedLoopJoin; fine against a
  *     bounded side, quadratic against two big ones.
  *
  * The lint runs on the OPTIMIZED logical plan (node types, not plan
  * strings), so it is robust to formatting and AQE section layout.
  */
class ScaleLintSpec extends SparkSpec {

  /** A side is scale-safe to replicate/broadcast when the optimizer can
    * BOUND it: literal data, or an aggregate that provably emits ≤
    * `cap` rows (global fit artifacts have maxRows = 1). */
  private def bounded(p: LogicalPlan, cap: Long = 1000L): Boolean =
    p.maxRows.exists(_ <= cap) || p.isInstanceOf[LocalRelation] ||
      p.collectLeaves().forall(_.isInstanceOf[LocalRelation])

  private def hasEquality(cond: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    cond.find {
      case _: EqualTo | _: EqualNullSafe => true
      case _ => false
    }.isDefined

  test("every registry query passes the scale lint (global windows / cross joins / theta joins)") {
    // Documented exceptions — each bounded by an explicit contract:
    val allow: Map[String, String] = Map(
      // exact O(n²) baselines kept as correctness oracles for the LSH/
      // IVF scale paths; the blocked kernel distributes the pairs and
      // the collect kernel enforces a broadcast-size cap
      "dedup_embedding_cosine" -> "exact pairwise baseline by contract",
      // theta/range join demo: the range side is a bounded dim by
      // construction (its contract documents the bound)
      "join_theta_range" -> "range join against a bounded side"
    )
    val failures = Registry.all.flatMap { q =>
      val plan =
        try q.fn(spark, sfDir).queryExecution.optimizedPlan
        catch {
          case e: Throwable =>
            fail(s"${q.name}: failed to plan: ${e.getMessage}")
        }
      val bad = Seq.newBuilder[String]
      plan.foreach {
        case w: Window if w.partitionSpec.isEmpty =>
          bad += "global-window (empty PARTITION BY funnels all rows to one task)"
        case j: Join if j.condition.isEmpty =>
          if (!bounded(j.left) && !bounded(j.right))
            bad += "unbounded-cross-join (neither side provably small)"
        case j: Join if j.condition.isDefined && !hasEquality(j.condition.get) =>
          if (!bounded(j.left, cap = 100000L) && !bounded(j.right, cap = 100000L))
            bad += "non-equi join over two unbounded sides (BNLJ at scale)"
        case _ => ()
      }
      val found = bad.result()
      if (found.isEmpty || allow.contains(q.name)) None
      else Some(s"${q.name}: ${found.mkString("; ")}")
    }
    assert(failures.isEmpty,
      s"scale lint failures (fix the plan or add a JUSTIFIED allowlist " +
        s"entry):\n${failures.mkString("\n")}")
    // the allowlist must not rot: every entry still names a real query
    val known = Registry.all.map(_.name).toSet
    assert(allow.keySet.subsetOf(known),
      s"stale allowlist entries: ${allow.keySet -- known}")
  }

  test("every driver-side collect in main sources declares its bound") {
    // 4th job-killer: .collect()/.head()/.first() materializes to the
    // driver — fine ONLY for provably bounded fit artifacts (a 1-row
    // agg, a limit(K) vocab, a dim table). The lint is mechanical:
    // every such call in src/main must carry a `bounded:` comment on
    // the same or one of the 3 preceding lines stating the bound, so a
    // new unbounded collect cannot land silently. tools/ (dev probes,
    // never on a query path) is excluded.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    assert(java.nio.file.Files.isDirectory(root),
      s"lint must run from the repo root; cwd=${System.getProperty("user.dir")}")
    val call = java.util.regex.Pattern.compile(
      """\.(collect\(\)|head\(\)|first\(\)|collectAsList\(\))""")
    val offenders = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.toString.contains("/tools/"))
      .flatMap { p =>
        val lines = java.nio.file.Files.readAllLines(p).asScala.toIndexedSeq
        lines.zipWithIndex.collect {
          case (line, i)
              if call.matcher(line).find() &&
                !(i - 3 to i).exists(j =>
                  j >= 0 && lines(j).contains("bounded:")) =>
            s"$p:${i + 1}: ${line.trim.take(80)}"
        }
      }.toSeq
    assert(offenders.isEmpty,
      "driver-side collect without a `bounded:` justification (state the " +
        s"bound or distribute the work):\n${offenders.mkString("\n")}")
  }
}
