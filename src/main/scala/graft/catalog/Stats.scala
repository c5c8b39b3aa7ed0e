package graft.catalog

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Catalog-level statistics read from file metadata — NOT from a Spark
  * job. Sizing decisions (LSH plane count, IVF cell count) need the
  * corpus cardinality; running `df.count()` for it costs a full extra
  * pass over the data before the real query (at 100 TB, a full scan).
  * Parquet footers already carry exact row counts, so we read those on
  * the driver: one footer per file, a few KB each — the same cost a
  * catalog's ANALYZE-backed stats would pay. Memoized per path.
  */
object Stats {
  // one entry per path: (fingerprint-of-listing, count). A rewritten
  // dataset gets a fresh count AND replaces (not leaks) the stale entry.
  // Every call re-lists the directory — driver-side metadata only, the
  // price of freshness; footer reads are skipped on fingerprint hits.
  private val cache = TrieMap.empty[String, (Long, Long)]

  /** Exact row count of a parquet file or directory of parquet files,
    * summed from footer metadata. Directories are listed RECURSIVELY so
    * partitioned layouts (`.../date=2020-01-01/part-*.parquet`) count
    * every leaf file; the memo key folds in each file's (path, length,
    * modification time), so a path rewritten within the same JVM gets a
    * fresh count while repeated sizing calls on stable data stay free. */
  def parquetRowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    var fingerprint = 0L
    if (fs.getFileStatus(p).isDirectory) {
      val it = fs.listFiles(p, true) // recursive: partitioned dirs count
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet")) {
          files += st.getPath
          fingerprint = fingerprint * 31 + st.getPath.toString.hashCode
          fingerprint = fingerprint * 31 + st.getLen
          fingerprint = fingerprint * 31 + st.getModificationTime
        }
      }
    } else {
      val st = fs.getFileStatus(p)
      files += p
      fingerprint = st.getLen * 31 + st.getModificationTime
    }
    cache.get(path) match {
      case Some((fp, count)) if fp == fingerprint => count
      case _ =>
        val count = files.map { f =>
          val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
          try r.getRecordCount finally r.close()
        }.sum
        cache.put(path, (fingerprint, count))
        count
    }
  }
}
