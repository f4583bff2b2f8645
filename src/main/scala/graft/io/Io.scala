package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import org.apache.spark.sql.functions.input_file_name
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.hadoop.fs.{Path => HPath}

/** Sources/sinks (SURVEY.md §2.1). CSV with declared schemas (S1/S2),
  * glob scans tagged with their originating file (S10), JSON results
  * stores (S6/S9), and the reference's single-file CSV submissions (S7) —
  * written distributed then promoted to one file, never collected.
  */
object Io {

  /** S1 — header CSV scan with a declared schema (never inferSchema at
    * scale: schema inference is an extra full read). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** S10 — glob scan with source-file provenance column.
    * Ref: final-assignment/experiments/utils/evaluate_all_submissions.py:27-36. */
  def readCsvGlob(spark: SparkSession, glob: String, schema: StructType,
                  fileCol: String = "source_file"): DataFrame =
    readCsv(spark, glob, schema).withColumn(fileCol, input_file_name())

  /** S7 — single-file CSV sink (submission files): executors write one
    * part, the driver renames it. Only metadata crosses the driver.
    * Ref: final-assignment/experiments/ensemble_experiment.py:204-219. */
  def writeSingleCsv(df: DataFrame, outFile: String): Unit = {
    val tmp = outFile + ".tmpdir"
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(tmp)
    val part = listDir(Paths.get(tmp))
      .find(_.getFileName.toString.startsWith("part-"))
      .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
    Files.createDirectories(Paths.get(outFile).toAbsolutePath.getParent)
    Files.move(part, Paths.get(outFile), StandardCopyOption.REPLACE_EXISTING)
    deleteRecursively(Paths.get(tmp))
  }

  /** Directory listing through a CLOSED stream (Files.list leaks a file
    * descriptor per call otherwise — CorpusBuild compacts per partition,
    * so leaked descriptors would accumulate across a long-lived session). */
  private def listDir(dir: Path): Vector[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector
    } finally s.close()
  }

  /** Recursive tree walk through a CLOSED stream, deepest-first (the order
    * a recursive delete needs). */
  private def walkTree(root: Path): Vector[Path] = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector.sortBy(_.getNameCount)(Ordering[Int].reverse)
    } finally s.close()
  }

  private def deleteRecursively(root: Path): Unit =
    if (Files.exists(root)) walkTree(root).foreach(Files.deleteIfExists(_))

  /** Partitioned parquet sink — the 100 TB table-layout primitive: writing
    * by a low-cardinality key (source, date, lang) gives every downstream
    * reader partition PRUNING for free (a filter on the key skips whole
    * directories before any IO; asserted in IoSpec). */
  def writeParquetPartitioned(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(path)

  /** ORC source/sink (the second columnar interchange format Spark ships;
    * same pushdown/pruning machinery as parquet — asserted in IoSpec). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** S6/S9 — JSON results store (one object per line). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Small-file compaction for a parquet table directory — the OPTIMIZE
    * maintenance job that complements [[Layout.writeZOrdered]]. Streaming
    * sinks and per-batch ingests accumulate many small files; at scale the
    * scan cost is then dominated by per-file open/footer overhead and the
    * driver's file-listing, not by data. Rewrite: target file count =
    * ceil(current bytes / targetBytes) (from the file listing — metadata
    * only, no data through the driver), `repartition(n)` for even output
    * sizes, write-temp-then-swap so readers never see a half-written
    * table. A crash between the two swap renames strands the data at
    * `.compact.old` with nothing at `path` — so entry first SELF-HEALS any
    * interrupted previous run: a leftover `.compact.old` is moved back (or
    * dropped if the swap had completed), a leftover `.compact.tmp` is
    * always dropped (it may be half-written). Returns (files before,
    * files after). */
  def compactParquet(spark: SparkSession, path: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    // Everything resolves through the path's Hadoop FileSystem, so the
    // same code runs on file://, hdfs://, and object-store schemes (the
    // GraftObjectStoreFs tests drive exactly this path). CAVEAT, object
    // stores: rename there is copy+delete, so the two-rename swap below
    // is NOT atomic — a reader racing the swap can see a missing or
    // partially-copied table, and a crash mid-copy of the second rename
    // can leave a partial table that the self-heal (which keys on the
    // directory EXISTING) would keep. The self-heal covers the
    // crash-BETWEEN-renames windows (tested with injected rename
    // failures); full crash-DURING-rename safety needs an atomic commit
    // primitive the store itself must supply — a transactional table
    // format (Delta/Iceberg) or a versioned-directory-plus-pointer-file
    // flip, which is the named production fix.
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    def walk(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] =
      if (!fs.exists(p)) Seq.empty
      else {
        val st = fs.getFileStatus(p)
        if (st.isFile) Seq(st)
        else fs.listStatus(p).toSeq.flatMap(c => walk(c.getPath))
      }
    def parts(p: HPath) = walk(p).filter(st =>
      st.getPath.getName.startsWith("part-") &&
        st.getPath.getName.contains(".parquet"))
    val tmp = new HPath(path + ".compact.tmp")
    val old = new HPath(path + ".compact.old")
    // self-heal an interrupted previous swap before touching anything
    if (fs.exists(old)) {
      if (!fs.exists(root))
        require(fs.rename(old, root), // crashed mid-swap
          s"compactParquet self-heal: rename $old -> $root failed")
      else fs.delete(old, true) // crashed before cleanup
    }
    fs.delete(tmp, true)
    // a hive-partitioned directory must be compacted per PARTITION — a
    // whole-table rewrite would fold the partition column into the data
    // files and silently destroy the pruning layout
    val partDirs =
      (if (fs.exists(root)) fs.listStatus(root).toSeq else Seq.empty)
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    require(partDirs.isEmpty,
      s"$path is hive-partitioned (${partDirs.head.getPath.getName} …) — " +
        "compact each partition directory instead")
    val before = parts(root)
    require(before.nonEmpty, s"$path contains no parquet part files")
    val totalBytes = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(n)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: the rename pair is the "commit"; a transactional table format
    // would make this atomic, the rewrite PLAN is identical
    require(fs.rename(root, old),
      s"compactParquet: rename $root -> $old failed")
    require(fs.rename(tmp, root),
      s"compactParquet: rename $tmp -> $root failed")
    fs.delete(old, true)
    (before.size, parts(root).size)
  }
}
