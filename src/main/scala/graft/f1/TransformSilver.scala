package graft.f1

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.IntegerType

/** Silver→gold transform — the reference's `Transform Silver Data` notebook
  * (SURVEY.md §3.3, operators A1-A4, J1-J4, W1-W2, P9).
  *
  * Deviations, both flagged in SURVEY §2.11 / §3.3:
  *   - `pitstopsJoinType` decides quirk Q3: the reference's bare inner join
  *     silently drops pre-pitstop-era results from every gold output;
  *     "inner" reproduces that, "left" + coalesce(0) is the fixed variant.
  *   - the five-way join tree is cached before its three consumers (the
  *     reference recomputes it per write — same results, 3× the work).
  *   - Q2's dead `fastestlapdf` (groupBy key containing the aggregated
  *     column, result unused) is NOT ported, per survey decision.
  */
object TransformSilver {

  /** A1: pitstop count per race-driver. */
  def pitstopCounts(pitstops: DataFrame): DataFrame =
    pitstops.groupBy("circuitRef", "date", "driverRef")
      .agg(max("stopNo").as("numberOfPitstops"))

  /** J1-J4 + 16-column qualified select (results-side wins name clashes). */
  def raceResults(results: DataFrame, drivers: DataFrame,
      constructors: DataFrame, circuits: DataFrame, pitstops: DataFrame,
      pitstopsJoinType: String = "inner"): DataFrame = {
    val ps = pitstopCounts(pitstops)
    val joined = results
      .join(drivers, drivers("driverRef") === results("driverRef"), "inner")
      .join(constructors, constructors("constructorRef") === results("constructorRef"), "inner")
      .join(circuits, circuits("circuitRef") === results("circuitRef"), "inner")
      .join(ps,
        ps("circuitRef") === results("circuitRef") &&
        ps("date") === results("date") &&
        ps("driverRef") === results("driverRef"), pitstopsJoinType)
    val base = joined.select(
      results("raceName"), circuits("location"), circuits("circuitName"),
      results("date"), results("position"), drivers("nationality"),
      drivers("firstName"), drivers("surname"), drivers("permanentNumber"),
      constructors("constructorName"), results("startGrid"),
      ps("numberOfPitstops"), results("fastestLapTime"), results("raceTime"),
      results("status"), results("points"))
    if (pitstopsJoinType == "inner") base
    else base.withColumn("numberOfPitstops", coalesce(col("numberOfPitstops"), lit(0)))
  }

  /** A3/A4 + W1/W2: standings = sum(points) + conditional win count,
    * ranked per season by (points desc, wins desc).
    */
  def standings(gpResults: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy("year").orderBy(desc("totalPoints"), desc("wins"))
    gpResults
      .withColumn("year", year(col("date")).cast(IntegerType))
      .drop("date")
      .groupBy("year", keys: _*)
      .agg(sum("points").as("totalPoints"),
        count(when(col("position") === 1, true)).as("wins"))
      .withColumn("position", rank().over(w))
  }

  def driverStandings(gpResults: DataFrame): DataFrame =
    standings(gpResults, Seq("firstName", "surname", "nationality", "constructorName"))

  def constructorStandings(gpResults: DataFrame): DataFrame =
    standings(gpResults, Seq("constructorName"))

  /** Full gold run over the newest silver folder: register silver tables
    * (S8/S9 analogue on temp views), write the three gold outputs.
    */
  def run(spark: SparkSession, lake: Lake,
      pitstopsJoinType: String = "inner"): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val run = Lake.newestFolder(s"${lake.root}/silver", conf)
      .getOrElse(sys.error(s"no silver runs under ${lake.root}/silver"))
    val read = (ds: String) => spark.read.parquet(lake.silver(run, ds))
    Lake.childFolders(lake.silverRun(run), conf).foreach { ds =>
      read(ds).createOrReplaceTempView(ds) // catalog surface for the SQL path
    }
    val gp = raceResults(read("results"), read("drivers"),
      read("constructors"), read("circuits"), read("pitstops"), pitstopsJoinType)
      .cache() // three consumers below; reference recomputes instead
    try {
      gp.write.mode(SaveMode.Overwrite).parquet(lake.gold(run, "raceResults"))
      driverStandings(gp).write.mode(SaveMode.Overwrite)
        .parquet(lake.gold(run, "driverStandings"))
      constructorStandings(gp).write.mode(SaveMode.Overwrite)
        .parquet(lake.gold(run, "constructorStandings"))
    } finally gp.unpersist()
    run
  }
}
