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
  private val cache = TrieMap.empty[String, Long]

  /** Exact row count of a parquet file or directory of parquet files,
    * summed from footer metadata. */
  def parquetRowCount(spark: SparkSession, path: String): Long =
    cache.getOrElseUpdate(path, {
      val conf = spark.sessionState.newHadoopConf()
      val p = new Path(path)
      val fs = p.getFileSystem(conf)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).map(_.getPath)
            .filter(f => f.getName.endsWith(".parquet"))
        else Array(p)
      files.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
        try r.getRecordCount finally r.close()
      }.sum
    })
}
