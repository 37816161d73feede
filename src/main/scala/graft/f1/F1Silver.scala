package graft.f1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Normalize
import graft.operators.Normalize.Field

/** Silver-layer schema enforcement for the twelve F1 datasets — the
  * declarative port of the reference's `renameAddSchema`
  * (`Notebooks/Clean Bronze Data.py:112-254`). Input is the flattened
  * bronze frame (path-mangled names from [[graft.operators.Flatten]]);
  * output is the fixed silver schema from SURVEY.md §1.2.
  *
  * Differences from the reference, by design (same result, better plan):
  *   - one `select` projection per dataset instead of ~20 stacked
  *     withColumnRenamed/drop calls (Catalyst collapses both to the same
  *     physical plan; this form also guarantees scan-level column pruning);
  *   - missing source columns (e.g. `Sprint` sessions before 2021) yield
  *     typed nulls instead of an AnalysisException — flagged `optional`.
  */
object F1Silver {

  private def p(parts: String*): String =
    parts.zipWithIndex.map { case (s, i) => s"$s*${i + 1}" }.mkString("->")

  /** Select declared fields; absent optional sources become typed nulls. */
  private def project(df: DataFrame, fields: Seq[(Field, Boolean)]): DataFrame = {
    val have = df.columns.toSet
    val cols = fields.map { case (f, optional) =>
      if (have.contains(f.from)) f.toColumn
      else if (optional) lit(null).cast(f.castTo.getOrElse(StringType)).as(f.to)
      else f.toColumn // let resolution fail loudly for required fields
    }
    df.select(cols: _*)
  }
  private implicit class FieldOps(f: Field) {
    def req: (Field, Boolean) = (f, false)
    def opt: (Field, Boolean) = (f, true)
  }

  // -- circuits (Clean Bronze Data.py:116-124)
  def circuits(df: DataFrame): DataFrame = project(df, Seq(
    Field(p("MRData", "CircuitTable", "Circuits", "circuitId"), "circuitRef").req,
    Field(p("MRData", "CircuitTable", "Circuits", "circuitName"), "circuitName").req,
    Field(p("MRData", "CircuitTable", "Circuits", "url"), "aboutUrl").req,
    Field(p("MRData", "CircuitTable", "Circuits", "Location") + "->country*5", "country").req,
    Field(p("MRData", "CircuitTable", "Circuits", "Location") + "->locality*5", "location").req,
    Field(p("MRData", "CircuitTable", "Circuits", "Location") + "->lat*5", "latitude", Some(DoubleType)).req,
    Field(p("MRData", "CircuitTable", "Circuits", "Location") + "->long*5", "longitude", Some(DoubleType)).req))

  // -- constructors (:147-152)
  def constructors(df: DataFrame): DataFrame = project(df, Seq(
    Field(p("MRData", "ConstructorTable", "Constructors", "constructorId"), "constructorRef").req,
    Field(p("MRData", "ConstructorTable", "Constructors", "name"), "constructorName").req,
    Field(p("MRData", "ConstructorTable", "Constructors", "url"), "aboutUrl").req,
    Field(p("MRData", "ConstructorTable", "Constructors", "nationality"), "nationality").req))

  // -- drivers (:163-173)
  def drivers(df: DataFrame): DataFrame = project(df, Seq(
    Field(p("MRData", "DriverTable", "Drivers", "dateOfBirth"), "dateOfBirth", Some(DateType)).req,
    Field(p("MRData", "DriverTable", "Drivers", "driverId"), "driverRef").req,
    Field(p("MRData", "DriverTable", "Drivers", "familyName"), "surname").req,
    Field(p("MRData", "DriverTable", "Drivers", "givenName"), "firstName").req,
    Field(p("MRData", "DriverTable", "Drivers", "nationality"), "nationality").req,
    Field(p("MRData", "DriverTable", "Drivers", "code"), "code").opt,
    Field(p("MRData", "DriverTable", "Drivers", "permanentNumber"), "permanentNumber").opt,
    Field(p("MRData", "DriverTable", "Drivers", "url"), "url").req))

  // -- seasons (:243-247)
  def seasons(df: DataFrame): DataFrame = project(df, Seq(
    Field(p("MRData", "SeasonTable", "Seasons", "season"), "season", Some(IntegerType)).req,
    Field(p("MRData", "SeasonTable", "Seasons", "url"), "aboutUrl").req))

  // -- status (:249-254)
  def status(df: DataFrame): DataFrame = project(df, Seq(
    Field(p("MRData", "StatusTable", "Status", "count"), "count", Some(IntegerType)).req,
    Field(p("MRData", "StatusTable", "Status", "statusId"), "statusId", Some(IntegerType)).req,
    Field(p("MRData", "StatusTable", "Status", "status"), "status").req))

  private val races = p("MRData", "RaceTable", "Races")

  // -- schedule (:126-145): strip Z, fuse date+time strings to timestamps
  def schedule(df: DataFrame): DataFrame = {
    def session(struct: String): org.apache.spark.sql.Column = {
      val d = s"`$races->$struct*4->date*5`"
      val t = s"`$races->$struct*4->time*5`"
      val have = df.columns.toSet
      if (have.contains(s"$races->$struct*4->date*5"))
        to_timestamp(concat(col(d), lit(" "),
          regexp_replace(col(t), "Z", "")), "yyyy-MM-dd HH:mm:ss")
      else lit(null).cast(TimestampType)
    }
    val base = df.withColumn("dateTime",
        to_timestamp(concat(col(s"`$races->date*4`"), lit(" "),
          regexp_replace(col(s"`$races->time*4`"), "Z", "")), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("FP1DateTime", session("FirstPractice"))
      .withColumn("FP2DateTime", session("SecondPractice"))
      .withColumn("FP3DateTime", session("ThirdPractice"))
      .withColumn("qualifyingDateTime", session("Qualifying"))
      .withColumn("sprintDateTime", session("Sprint"))
    base.select(
      col(s"`$races->raceName*4`").as("raceName"),
      col(s"`$races->url*4`").as("aboutUrl"),
      col(s"`$races->Circuit*4->circuitId*5`").as("circuitRef"),
      col(s"`$races->season*4`").cast(IntegerType).as("year"),
      col(s"`$races->round*4`").cast(IntegerType).as("round"),
      col("dateTime"), col("FP1DateTime"), col("FP2DateTime"),
      col("FP3DateTime"), col("qualifyingDateTime"), col("sprintDateTime"))
  }

  // -- results (:220-241)
  def results(df: DataFrame): DataFrame = {
    val r = s"$races->Results*4"
    project(df, Seq(
      Field(s"$races->date*4", "date", Some(DateType)).req,
      Field(s"$r->grid*5", "startGrid", Some(IntegerType)).req,
      Field(s"$r->laps*5", "lapsCompleted", Some(IntegerType)).req,
      Field(s"$r->number*5", "number", Some(IntegerType)).req,
      Field(s"$r->points*5", "points", Some(DoubleType)).req,
      Field(s"$r->position*5", "position", Some(IntegerType)).req,
      Field(s"$r->Time*5->millis*6", "millis", Some(IntegerType)).opt,
      Field(s"$r->FastestLap*5->AverageSpeed*6->speed*7", "fastestLapAverageSpeed", Some(DoubleType)).opt,
      Field(s"$r->FastestLap*5->lap*6", "fastestLapNumber", Some(IntegerType)).opt,
      Field(s"$r->FastestLap*5->rank*6", "fastestLapRank", Some(IntegerType)).opt,
      Field(s"$races->raceName*4", "raceName").req,
      Field(s"$races->Circuit*4->circuitId*5", "circuitRef").req,
      Field(s"$r->Constructor*5->constructorId*6", "constructorRef").req,
      Field(s"$r->Driver*5->driverId*6", "driverRef").req,
      Field(s"$r->positionText*5", "positionText").req,
      Field(s"$r->status*5", "status").req,
      Field(s"$r->FastestLap*5->AverageSpeed*6->units*7", "fastestLapAverageSpeedUnits").opt,
      Field(s"$r->FastestLap*5->Time*6->time*7", "fastestLapTime").opt,
      Field(s"$r->Time*5->time*6", "raceTime").opt))
  }

  // -- pitstops (:197-206)
  def pitstops(df: DataFrame): DataFrame = {
    val ps = s"$races->PitStops*4"
    project(df, Seq(
      Field(s"$races->date*4", "date", Some(DateType)).req,
      Field(s"$ps->lap*5", "lapNumber", Some(IntegerType)).req,
      Field(s"$ps->stop*5", "stopNo", Some(IntegerType)).req,
      Field(s"$races->Circuit*4->circuitId*5", "circuitRef").req,
      Field(s"$ps->driverId*5", "driverRef").req,
      Field(s"$ps->duration*5", "pitstopDuration").req,
      Field(s"$ps->time*5", "pitstopTime").req))
  }

  // -- laps (:187-195)
  def laps(df: DataFrame): DataFrame = {
    val l = s"$races->Laps*4"
    project(df, Seq(
      Field(s"$l->number*5", "lapNumber", Some(IntegerType)).req,
      Field(s"$l->Timings*5->position*6", "position", Some(IntegerType)).req,
      Field(s"$races->date*4", "date", Some(DateType)).req,
      Field(s"$races->Circuit*4->circuitId*5", "circuitRef").req,
      Field(s"$l->Timings*5->driverId*6", "driverRef").req,
      Field(s"$l->Timings*5->time*6", "lapTime").req))
  }

  // -- qualifying (:208-218)
  def qualifying(df: DataFrame): DataFrame = {
    val q = s"$races->QualifyingResults*4"
    project(df, Seq(
      Field(s"$races->date*4", "date", Some(DateType)).req,
      Field(s"$q->position*5", "position", Some(IntegerType)).req,
      Field(s"$races->Circuit*4->circuitId*5", "circuitRef").req,
      Field(s"$q->Constructor*5->constructorId*6", "constructorRef").req,
      Field(s"$q->Driver*5->driverId*6", "driverRef").req,
      Field(s"$q->Q1*5", "q1").opt,
      Field(s"$q->Q2*5", "q2").opt,
      Field(s"$q->Q3*5", "q3").opt))
  }

  private val standings = p("MRData", "StandingsTable", "StandingsLists")

  // -- driverStandings (:175-185)
  def driverStandings(df: DataFrame): DataFrame = {
    val ds = s"$standings->DriverStandings*4"
    project(df, Seq(
      Field(s"$standings->round*4", "round", Some(IntegerType)).req,
      Field(s"$standings->season*4", "season", Some(IntegerType)).req,
      Field(s"$ds->points*5", "points", Some(DoubleType)).req,
      Field(s"$ds->position*5", "position", Some(IntegerType)).req,
      Field(s"$ds->wins*5", "wins", Some(IntegerType)).req,
      Field(s"$ds->Constructors*5->constructorId*6", "constructorRef").req,
      Field(s"$ds->Driver*5->driverId*6", "driverRef").req,
      Field(s"$ds->positionText*5", "positionText").req))
  }

  // -- constructorStandings (:154-161)
  def constructorStandings(df: DataFrame): DataFrame = {
    val cs = s"$standings->ConstructorStandings*4"
    project(df, Seq(
      Field(s"$cs->points*5", "points", Some(DoubleType)).req,
      Field(s"$cs->position*5", "position", Some(IntegerType)).req,
      Field(s"$cs->wins*5", "wins", Some(IntegerType)).req,
      Field(s"$cs->Constructor*5->constructorId*6", "constructorRef").req,
      Field(s"$cs->positionText*5", "positionText").req))
  }

  /** Dataset name → normalizer, as the clean job dispatches them. */
  val normalizers: Map[String, DataFrame => DataFrame] = Map(
    "circuits" -> circuits, "constructors" -> constructors,
    "drivers" -> drivers, "seasons" -> seasons, "status" -> status,
    "schedule" -> schedule, "results" -> results, "pitstops" -> pitstops,
    "laps" -> laps, "qualifying" -> qualifying,
    "driverStandings" -> driverStandings,
    "constructorStandings" -> constructorStandings)
}
