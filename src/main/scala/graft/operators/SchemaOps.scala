package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

/** Schema transforms over (possibly nested) rows — the
  * `schemas/transforms/` family of the reference re-expressed as column
  * algebra:
  *
  *  - `Select.fieldNames/flattenedSchema` (reference:
  *    sdks/java/core/.../schemas/transforms/Select.java:100,121)
  *  - `RenameFields` (RenameFields.java:64 — rename by path, nested
  *    paths included)
  *  - `AddFields` (AddFields.java:65 — add top-level or nested fields)
  *  - `DropFields` (DropFields.java — drop by path)
  *  - `Cast.widening/narrowing` (Cast.java:60,64 — per-path type casts)
  *
  * Everything compiles to `withField`/`dropFields`/`cast` expressions —
  * pure per-row projections, zero shuffles, fully codegen'd, so the
  * whole family is scan-parallel at any data size. Nested paths use
  * dot syntax (`"fin.amt"`); flattening joins path segments with `_`
  * (parquet-safe, where Beam's flattened schema keeps `.`-joined
  * names).
  */
object SchemaOps {

  /** Beam `RenameFields`: rename fields by path. Top-level names use
    * `withColumnRenamed`; nested paths rebuild the enclosing struct
    * with `withField` + `dropFields` (field order inside the struct
    * moves the renamed field to the end, as Spark appends new fields —
    * positional struct equality is not part of the contract). */
  def renameFields(df: DataFrame, renames: (String, String)*): DataFrame =
    renames.foldLeft(df) { case (d, (path, newName)) =>
      require(!newName.contains("."), s"new name must be unqualified: $newName")
      if (!path.contains(".")) d.withColumnRenamed(path, newName)
      else {
        val segs = path.split('.')
        val top = segs.head
        val rel = segs.tail // path inside the top-level struct column
        // withField-then-dropFields is only a rename when the target
        // name is genuinely new: renaming a field onto ITSELF would
        // write then delete it (field vanishes), and renaming onto an
        // existing sibling would silently clobber the sibling's value.
        // Beam's RenameFields errors on both — resolve the parent
        // struct's schema and do the same.
        require(newName != rel.last,
          s"rename target equals current name: $path -> $newName")
        val parent = rel.dropRight(1).foldLeft(
          d.schema(top).dataType.asInstanceOf[StructType]) { (s, seg) =>
          s(seg).dataType.asInstanceOf[StructType]
        }
        require(!parent.fieldNames.contains(newName),
          s"rename target '$newName' already exists among siblings of $path")
        val newRel = (rel.dropRight(1) :+ newName).mkString(".")
        d.withColumn(top,
          col(top).withField(newRel, col(path)).dropFields(rel.mkString(".")))
      }
    }

  /** Beam `AddFields`: add computed (or null-default) fields; nested
    * paths land inside the enclosing struct via `withField`. */
  def addFields(df: DataFrame, fields: (String, Column)*): DataFrame =
    fields.foldLeft(df) { case (d, (path, value)) =>
      if (!path.contains(".")) d.withColumn(path, value)
      else {
        val top = path.split('.').head
        d.withColumn(top, col(top).withField(path.stripPrefix(s"$top."), value))
      }
    }

  /** Beam `DropFields`: drop by path (top-level or nested). */
  def dropFields(df: DataFrame, paths: String*): DataFrame =
    paths.foldLeft(df) { (d, path) =>
      if (!path.contains(".")) d.drop(path)
      else {
        val top = path.split('.').head
        d.withColumn(top, col(top).dropFields(path.stripPrefix(s"$top.")))
      }
    }

  /** Beam `Cast.widening/narrowing`: cast fields by path. Spark `cast`
    * implements both directions; narrowing follows ANSI/legacy session
    * semantics (overflow → error/null), use `try_cast` semantics via
    * [[Relational.withFailures]] for a dead-lettered variant. */
  def castFields(df: DataFrame, casts: (String, DataType)*): DataFrame =
    casts.foldLeft(df) { case (d, (path, dt)) =>
      if (!path.contains(".")) d.withColumn(path, col(path).cast(dt))
      else {
        val top = path.split('.').head
        d.withColumn(top,
          col(top).withField(path.stripPrefix(s"$top."), col(path).cast(dt)))
      }
    }

  /** Beam `Select.flattenedSchema`: recursively lift every nested
    * struct leaf to a top-level column named by the `_`-joined path. */
  def flattenSchema(df: DataFrame): DataFrame = {
    def leaves(prefix: String, schema: StructType): Seq[(String, String)] =
      schema.fields.flatMap { f =>
        val path = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case s: StructType => leaves(path, s)
          case _ => Seq(path -> path.replace('.', '_'))
        }
      }.toSeq
    df.select(leaves("", df.schema).map { case (p, n) => col(p).as(n) }: _*)
  }
}
