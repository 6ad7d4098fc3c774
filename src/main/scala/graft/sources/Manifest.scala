package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Snapshot publish manifest — the completeness contract between a
  * pipeline that materializes a dataset and everything downstream that
  * consumes it.
  *
  * Spark's commit protocol gives per-JOB atomicity (`_SUCCESS`), but a
  * consumer reading a directory cannot tell whether the files it lists
  * are the files the producer committed: a partial copy, a lost file,
  * or a second job's stray output all read "successfully". Beam
  * pipelines hit the same gap after `FileIO.write` (reference:
  * sdks/java/core/.../io/FileIO.java's finalize step names the shards
  * for exactly this reason). The manifest pins the snapshot: the exact
  * file names, per-file sizes and row counts, written AFTER the data
  * (write order is the atomicity: no manifest ⇒ not published).
  *
  * At 100 TB the verify path stays metadata-only for sizes (one
  * listing) and distributed for counts (one scan of the named files
  * only), and the manifest itself is O(files), not O(rows).
  */
object Manifest {

  final case class FileEntry(name: String, bytes: Long, rows: Long)
  final case class Snapshot(format: String, nFiles: Long, totalBytes: Long,
      totalRows: Long, files: Seq[FileEntry])

  val ManifestFile = "_MANIFEST.json"

  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.getName, s.getLen))
      .sortBy(_._1)
  }

  /** Count rows per physical file in one distributed scan of `dir`. */
  private def rowCounts(spark: SparkSession, dir: String,
      format: String): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    spark.read.format(format).load(dir)
      .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
      .collect() // bounded: O(files) per-file counts
      .map(r => new Path(r.getString(0)).getName -> r.getLong(1)).toMap
  }

  private def render(s: Snapshot): String = {
    def q(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val files = s.files.map(f =>
      s"""{"name":${q(f.name)},"bytes":${f.bytes},"rows":${f.rows}}""")
      .mkString("[", ",", "]")
    s"""{"format":${q(s.format)},"n_files":${s.nFiles},""" +
      s""""total_bytes":${s.totalBytes},"total_rows":${s.totalRows},""" +
      s""""files":$files}"""
  }

  private def parse(json: String): Snapshot = {
    // dependency-free parse of exactly what `render` writes
    def longOf(key: String, src: String): Long =
      s""""$key":(-?\\d+)""".r.findFirstMatchIn(src).get.group(1).toLong
    val files = """\{"name":"((?:[^"\\]|\\.)*)","bytes":(\d+),"rows":(\d+)\}""".r
      .findAllMatchIn(json).map { m =>
        FileEntry(m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"),
          m.group(2).toLong, m.group(3).toLong)
      }.toSeq
    val fmt = """"format":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).get.group(1)
    Snapshot(fmt, longOf("n_files", json), longOf("total_bytes", json),
      longOf("total_rows", json), files)
  }

  /** Publish: inventory the committed data files of `dir` (names,
    * sizes, row counts) and write `_MANIFEST.json` last. */
  def publish(spark: SparkSession, dir: String,
      format: String = "parquet"): Snapshot = {
    val sizes = dataFiles(spark, dir)
    val counts = rowCounts(spark, dir, format)
    val entries = sizes.map { case (name, bytes) =>
      FileEntry(name, bytes, counts.getOrElse(name, 0L))
    }
    val snap = Snapshot(format, entries.size, entries.map(_.bytes).sum,
      entries.map(_.rows).sum, entries)
    val p = new Path(dir, ManifestFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write((render(snap) + "\n").getBytes("UTF-8")) finally out.close()
    snap
  }

  /** Verify `dir` against its manifest. Sizes/names check from one
    * listing; `recount = true` additionally re-runs the distributed
    * row count. Returns the mismatches (empty = snapshot intact). */
  def verify(spark: SparkSession, dir: String,
      recount: Boolean = false): Seq[String] = {
    val p = new Path(dir, ManifestFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Seq(s"missing $ManifestFile — not published")
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val snap = parse(json)
    val actual = dataFiles(spark, dir).toMap
    val errs = Seq.newBuilder[String]
    for (f <- snap.files) actual.get(f.name) match {
      case None => errs += s"missing file ${f.name}"
      case Some(bytes) if bytes != f.bytes =>
        errs += s"size mismatch ${f.name}: manifest ${f.bytes}, actual $bytes"
      case _ =>
    }
    for (name <- actual.keySet -- snap.files.map(_.name).toSet)
      errs += s"unmanifested file $name"
    if (recount && errs.result().isEmpty) {
      val counts = rowCounts(spark, dir, snap.format)
      for (f <- snap.files; n = counts.getOrElse(f.name, 0L); if n != f.rows)
        errs += s"row-count mismatch ${f.name}: manifest ${f.rows}, actual $n"
    }
    errs.result()
  }
}
