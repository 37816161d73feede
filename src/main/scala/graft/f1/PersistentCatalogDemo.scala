package graft.f1

import org.apache.spark.sql.SparkSession

/** Cross-JVM persistent-catalog fidelity check (reference: `Transform
  * Silver Data.py:71-72` creates `DATABASE silver LOCATION ...` against a
  * workspace metastore; `Data Visualization.sql` then queries it by name
  * from a different notebook session). Two phases, run in SEPARATE JVMs
  * by F1PipelineSpec:
  *
  *  - `create`: Derby-backed session ([[graft.Engine.persistentSession]]),
  *    `CREATE DATABASE silver LOCATION`, managed star-schema tables, and
  *    a full [[SqlReports.run]] against them — the reference's SQL
  *    analysis surface running on the persistent catalog, not temp views.
  *  - `reopen`: a brand-new JVM over the same metastore root re-runs
  *    [[SqlReports.run]] with NO table registration — every input
  *    resolves from Derby metadata alone, which is the persistence claim.
  *
  * Fixture rows mirror F1PipelineSpec's hand-computable standings (alice
  * wins every race) so the reopened report is asserted exactly.
  */
object PersistentCatalogDemo {

  private def seedTables(spark: SparkSession): Unit = {
    import spark.implicits._
    Seq(
      ("2021-03-28", "alice", "redcars", "c1", 1, 25.0),
      ("2021-03-28", "bob", "bluecars", "c1", 2, 18.0),
      ("2021-04-11", "alice", "redcars", "c1", 1, 25.0),
      ("2021-04-11", "bob", "bluecars", "c1", 2, 18.0))
      .toDF("date", "driverRef", "constructorRef", "circuitRef",
        "position", "points")
      .selectExpr("CAST(date AS DATE) AS date", "driverRef",
        "constructorRef", "circuitRef", "position", "points")
      .write.mode("overwrite").saveAsTable("silver.results")
    Seq(("alice", "alice", "alice"), ("bob", "bob", "bob"))
      .toDF("driverRef", "firstName", "surname")
      .write.mode("overwrite").saveAsTable("silver.drivers")
    Seq(("redcars", "redcars"), ("bluecars", "bluecars"))
      .toDF("constructorRef", "constructorName")
      .write.mode("overwrite").saveAsTable("silver.constructors")
    Seq(Tuple1("c1")).toDF("circuitRef")
      .write.mode("overwrite").saveAsTable("silver.circuits")
  }

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val phase = args(1)
    val spark = graft.Engine.persistentSession(root)
    try {
      phase match {
        case "create" =>
          spark.sql(
            s"CREATE DATABASE IF NOT EXISTS silver LOCATION '$root/warehouse/silver.db'")
          seedTables(spark)
          spark.sql("USE silver")
          val n = SqlReports.run(spark, minRacesDrivers = 1,
            minRacesConstructors = 1)("dominantDriversPerYear").count()
          println(s"CREATED report_rows=$n")
        case "reopen" =>
          // no registration of any kind: tables must resolve from Derby
          require(spark.catalog.tableExists("silver.results"),
            "silver.results not found after reopen — metastore did not persist")
          spark.sql("USE silver")
          val rows = SqlReports.run(spark, minRacesDrivers = 1,
            minRacesConstructors = 1)("dominantDriversPerYear")
            .collect()
            .map(r => s"${r.getAs[Any]("year")}:${r.getAs[String]("driverName")}" +
              s":${r.getAs[Long]("totalRaces")}")
          println(s"PERSISTED ${rows.mkString(",")}")
      }
    } finally spark.stop()
  }
}
