package graft.pipelines

import org.apache.spark.sql.SparkSession

import graft.sinks.{HttpFetchSink, JsonLogger}
import graft.sources.{JdbcCatalog, ParquetCatalog}

/** §3 CLI parity with the reference's `npm run export [module] [idfile]`
  * dispatcher (app.js:9-39):
  *
  *   - no args          → export every module in reference order
  *   - `module`         → export that one module
  *   - `module idfile`  → export that module restricted to the ID list
  *   - unknown module   → "please provide valid module name." (app.js:21)
  *   - more than 2 args → "only one module can be exported at a time."
  *                        (app.js:36)
  *   - success          → "Data exporting has been completed" (app.js:42)
  *
  * All messages go through the winston-parity [[JsonLogger]] (error/
  * success channels), matching the reference's errorLogger/successLogger
  * globals (app.js:3-5). One deliberate deviation, documented: the
  * reference exits 0 even on an arg error (`return 0` at module scope);
  * this CLI exits 1 on errors so shell pipelines can see the failure.
  *
  * Configuration is environment-driven (the reference's ./config module):
  *   GRAFT_WP_JDBC_URL   JDBC url → [[JdbcCatalog]] (production path);
  *                       GRAFT_WP_JDBC_USER/PASSWORD optional credentials
  *   GRAFT_WP_DATA       parquet dir → [[ParquetCatalog]] (staging path;
  *                       used when no JDBC url is set)
  *   GRAFT_EXPORT_OUT    output dir (default ./export-out)
  *   GRAFT_CONTENTTYPES  optional contenttypes config dir (__priority.json
  *                       ordering + per-module field conformance)
  */
object ExportMain {
  /** Parsed CLI decision — pure, so WpPipelineSpec can assert the arg
    * contract without forking a JVM. */
  sealed trait Cmd
  case object RunAll extends Cmd
  final case class RunOne(module: String, idFile: Option[String]) extends Cmd
  final case class Bad(message: String) extends Cmd

  /** app.js:9 modulesList — the valid module names, reference order. */
  val modulesList = Seq("assets", "authors", "categories", "posts")

  def parse(args: Seq[String]): Cmd = args match {
    case Seq() => RunAll
    case Seq(m) if modulesList.contains(m) => RunOne(m, None)
    case Seq(m, idFile) if modulesList.contains(m) => RunOne(m, Some(idFile))
    case Seq(_) | Seq(_, _) => Bad("please provide valid module name.")
    case _ => Bad("only one module can be exported at a time.")
  }

  def main(args: Array[String]): Unit = {
    val outDir = sys.env.getOrElse("GRAFT_EXPORT_OUT", "export-out")
    val logger = new JsonLogger(s"$outDir/logs", "export")
    parse(args.toSeq) match {
      case Bad(msg) =>
        logger.error(msg)
        System.err.println(msg)
        sys.exit(1)
      case cmd =>
        val spark = SparkSession.builder()
          .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
          .appName("graft-export")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
          .config("spark.sql.session.timeZone", "UTC")
          .getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        val cat = sys.env.get("GRAFT_WP_JDBC_URL") match {
          case Some(url) =>
            val props = new java.util.Properties()
            sys.env.get("GRAFT_WP_JDBC_USER").foreach(props.setProperty("user", _))
            sys.env.get("GRAFT_WP_JDBC_PASSWORD").foreach(props.setProperty("password", _))
            new JdbcCatalog(url, props)
          case None =>
            new ParquetCatalog(sys.env.getOrElse("GRAFT_WP_DATA", "wp-data"))
        }
        val orch = new Orchestrator(spark, cat, outDir,
          HttpFetchSink.defaultFetcher,
          contentTypesDir = sys.env.get("GRAFT_CONTENTTYPES"))
        try {
          val counts = cmd match {
            case RunOne(m, idFile) => Map(m -> orch.runModule(m, idFile))
            case _ => orch.run()
          }
          logger.log("Data exporting has been completed",
            counts.map { case (k, v) => k -> (v: Any) })
          println("Data exporting has been completed")
          counts.toSeq.sortBy(_._1).foreach { case (m, n) => println(s"  $m: $n") }
          spark.stop()
        } catch {
          case e: Throwable => // app.js:44 errorLogger(error)
            logger.error(String.valueOf(e.getMessage))
            System.err.println(e.getMessage)
            spark.stop()
            sys.exit(1)
        }
    }
  }
}
