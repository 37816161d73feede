package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.concurrent.ExecutionContext.Implicits.global
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.f1._

/** End-to-end F1 lake pipeline on Ergast-shaped fixture JSON:
  * ingest (canned pages) → bronze → clean → silver → transform → gold →
  * SQL reports. Fixture values are hand-computable so standings and ranks
  * are asserted exactly.
  */
class F1PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def driver(id: String, given: String, family: String) =
    s"""{"driverId": "$id", "url": "u", "givenName": "$given", "familyName": "$family",
       | "dateOfBirth": "1990-01-01", "nationality": "X", "code": "${id.toUpperCase.take(3)}",
       | "permanentNumber": "7"}""".stripMargin

  private def result(pos: Int, points: Double, drv: String, cons: String) =
    s"""{"number": "44", "position": "$pos", "positionText": "$pos", "points": "$points",
       | "Driver": ${driver(drv, drv, drv)},
       | "Constructor": {"constructorId": "$cons", "url": "u", "name": "$cons", "nationality": "Y"},
       | "grid": "3", "laps": "56", "status": "Finished",
       | "Time": {"millis": "5523897", "time": "1:32:03.897"},
       | "FastestLap": {"rank": "1", "lap": "44",
       |   "Time": {"time": "1:34.015"},
       |   "AverageSpeed": {"units": "kph", "speed": "207.235"}}}""".stripMargin

  private def race(season: Int, round: Int, date: String, results: Seq[String]) =
    s"""{"season": "$season", "round": "$round", "url": "u", "raceName": "GP $round",
       | "Circuit": {"circuitId": "c1", "url": "u", "circuitName": "Circuit One",
       |   "Location": {"lat": "1.5", "long": "2.5", "locality": "Town", "country": "Land"}},
       | "date": "$date", "time": "15:00:00Z",
       | "Results": [${results.mkString(",")}]}""".stripMargin

  private def mrdata(tableName: String, tableJson: String, total: Int) =
    s"""{"MRData": {"xmlns": "x", "series": "f1", "url": "u", "limit": "1000",
       | "offset": "0", "total": "$total", $tableName: $tableJson}}""".stripMargin

  private def pitstopRace(season: Int, round: Int, date: String, stops: Seq[(String, Int)]) = {
    val ps = stops.map { case (drv, stop) =>
      s"""{"driverId": "$drv", "lap": "${10 * stop}", "stop": "$stop",
         | "time": "14:2$stop:00", "duration": "2$stop.5"}""".stripMargin
    }
    s"""{"season": "$season", "round": "$round", "url": "u", "raceName": "GP $round",
       | "Circuit": {"circuitId": "c1", "url": "u", "circuitName": "Circuit One",
       |   "Location": {"lat": "1.5", "long": "2.5", "locality": "Town", "country": "Land"}},
       | "date": "$date", "time": "15:00:00Z",
       | "PitStops": [${ps.mkString(",")}]}""".stripMargin
  }

  private lazy val lakeRoot: String = {
    val root = Files.createTempDirectory("f1lake").toString
    val run = "20240101_000000"
    def write(ds: String, name: String, content: String): Unit = {
      val p = Paths.get(root, "bronze", run, ds, name)
      Files.createDirectories(p.getParent)
      // Spark's JSON source is line-delimited: one document per line
      Files.write(p, content.replace("\n", " ").getBytes(StandardCharsets.UTF_8))
    }
    // two races in 2021: alice wins both (25pt), bob second (18pt)
    val races2021 = Seq(
      race(2021, 1, "2021-03-28", Seq(
        result(1, 25.0, "alice", "redcars"), result(2, 18.0, "bob", "bluecars"))),
      race(2021, 2, "2021-04-11", Seq(
        result(1, 25.0, "alice", "redcars"), result(2, 18.0, "bob", "bluecars"))))
    write("results", "results_1.json",
      mrdata(""""RaceTable"""", s"""{"Races": [${races2021.mkString(",")}]}""", 4))
    write("drivers", "drivers_1.json",
      mrdata(""""DriverTable"""",
        s"""{"Drivers": [${driver("alice", "alice", "alice")}, ${driver("bob", "bob", "bob")}]}""", 2))
    write("constructors", "constructors_1.json",
      mrdata(""""ConstructorTable"""",
        """{"Constructors": [
          | {"constructorId": "redcars", "url": "u", "name": "redcars", "nationality": "Y"},
          | {"constructorId": "bluecars", "url": "u", "name": "bluecars", "nationality": "Y"}]}""".stripMargin, 2))
    write("circuits", "circuits_1.json",
      mrdata(""""CircuitTable"""",
        """{"Circuits": [{"circuitId": "c1", "url": "u", "circuitName": "Circuit One",
          | "Location": {"lat": "1.5", "long": "2.5", "locality": "Town", "country": "Land"}}]}""".stripMargin, 1))
    val pits = Seq(
      pitstopRace(2021, 1, "2021-03-28", Seq(("alice", 1), ("alice", 2), ("bob", 1))),
      pitstopRace(2021, 2, "2021-04-11", Seq(("alice", 1), ("bob", 1))))
    write("pitstops", "pitstops_1.json",
      mrdata(""""RaceTable"""", s"""{"Races": [${pits.mkString(",")}]}""", 5))
    // remaining datasets: schedule, laps, qualifying, seasons, status,
    // driverStandings, constructorStandings
    write("schedule", "schedule_1.json", mrdata(""""RaceTable"""",
      """{"Races": [{"season": "2021", "round": "1", "url": "u", "raceName": "GP 1",
        | "Circuit": {"circuitId": "c1", "url": "u", "circuitName": "Circuit One",
        |   "Location": {"lat": "1.5", "long": "2.5", "locality": "Town", "country": "Land"}},
        | "date": "2021-03-28", "time": "15:00:00Z",
        | "FirstPractice": {"date": "2021-03-26", "time": "11:30:00Z"},
        | "SecondPractice": {"date": "2021-03-26", "time": "15:00:00Z"},
        | "ThirdPractice": {"date": "2021-03-27", "time": "12:00:00Z"},
        | "Qualifying": {"date": "2021-03-27", "time": "15:00:00Z"},
        | "Sprint": {"date": "2021-03-27", "time": "18:00:00Z"}}]}""".stripMargin, 1))
    write("laps", "laps_1.json", mrdata(""""RaceTable"""",
      """{"season": "2021", "round": "1",
        | "Races": [{"season": "2021", "round": "1", "url": "u", "raceName": "GP 1",
        | "Circuit": {"circuitId": "c1", "url": "u", "circuitName": "Circuit One",
        |   "Location": {"lat": "1.5", "long": "2.5", "locality": "Town", "country": "Land"}},
        | "date": "2021-03-28", "time": "15:00:00Z",
        | "Laps": [{"number": "1", "Timings": [
        |   {"driverId": "alice", "position": "1", "time": "1:31.123"},
        |   {"driverId": "bob", "position": "2", "time": "1:32.456"}]},
        |  {"number": "2", "Timings": [
        |   {"driverId": "alice", "position": "1", "time": "1:30.999"}]}]}]}""".stripMargin, 3))
    write("qualifying", "qualifying_1.json", mrdata(""""RaceTable"""",
      """{"Races": [{"season": "2021", "round": "1", "url": "u", "raceName": "GP 1",
        | "Circuit": {"circuitId": "c1", "url": "u", "circuitName": "Circuit One",
        |   "Location": {"lat": "1.5", "long": "2.5", "locality": "Town", "country": "Land"}},
        | "date": "2021-03-28", "time": "15:00:00Z",
        | "QualifyingResults": [{"number": "44", "position": "1",
        |   "Driver": {"driverId": "alice", "url": "u", "givenName": "alice",
        |     "familyName": "alice", "dateOfBirth": "1990-01-01", "nationality": "X"},
        |   "Constructor": {"constructorId": "redcars", "url": "u", "name": "redcars",
        |     "nationality": "Y"},
        |   "Q1": "1:31.1", "Q2": "1:30.5", "Q3": "1:29.9"}]}]}""".stripMargin, 1))
    write("seasons", "seasons_1.json", mrdata(""""SeasonTable"""",
      """{"Seasons": [{"season": "2020", "url": "u"}, {"season": "2021", "url": "u"}]}""", 2))
    write("status", "status_1.json", mrdata(""""StatusTable"""",
      """{"Status": [{"statusId": "1", "count": "3", "status": "Finished"},
        | {"statusId": "2", "count": "1", "status": "Accident"}]}""".stripMargin, 2))
    write("driverStandings", "driverStandings_1.json", mrdata(""""StandingsTable"""",
      """{"StandingsLists": [{"season": "2021", "round": "2",
        | "DriverStandings": [{"position": "1", "positionText": "1", "points": "50",
        |   "wins": "2",
        |   "Driver": {"driverId": "alice", "url": "u", "givenName": "alice",
        |     "familyName": "alice", "dateOfBirth": "1990-01-01", "nationality": "X",
        |     "code": "ALI", "permanentNumber": "7"},
        |   "Constructors": [{"constructorId": "redcars", "url": "u",
        |     "name": "redcars", "nationality": "Y"}]}]}]}""".stripMargin, 1))
    write("constructorStandings", "constructorStandings_1.json", mrdata(""""StandingsTable"""",
      """{"StandingsLists": [{"season": "2021", "round": "2",
        | "ConstructorStandings": [{"position": "1", "positionText": "1",
        |   "points": "86", "wins": "2",
        |   "Constructor": {"constructorId": "redcars", "url": "u",
        |     "name": "redcars", "nationality": "Y"}}]}]}""".stripMargin, 1))
    root
  }

  test("all twelve silver normalizers produce their declared schemas") {
    val lake = Lake(lakeRoot)
    val cleaned = CleanBronze.run(spark, lake)
    assert(cleaned.toSet == F1Silver.normalizers.keySet)
    val run = "20240101_000000"
    def silver(ds: String) = spark.read.parquet(lake.silver(run, ds))

    val sched = silver("schedule")
    assert(sched.columns.toSet == Set("raceName", "aboutUrl", "circuitRef",
      "year", "round", "dateTime", "FP1DateTime", "FP2DateTime", "FP3DateTime",
      "qualifyingDateTime", "sprintDateTime", "ingestiondate"))
    val schedRow = sched.collect().head
    assert(schedRow.getAs[java.sql.Timestamp]("dateTime").toString
      .startsWith("2021-03-28 15:00:00"))

    val laps = silver("laps")
    assert(laps.count() == 3) // two nested explodes: 2 laps x timings
    assert(laps.columns.toSet == Set("lapNumber", "position", "date",
      "circuitRef", "driverRef", "lapTime", "ingestiondate"))

    val quali = silver("qualifying")
    assert(quali.collect().head.getAs[String]("q3") == "1:29.9")

    assert(silver("seasons").select("season").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2020, 2021))
    assert(silver("status").filter(col("status") === "Finished")
      .select("count").head().getInt(0) == 3)
    val ds = silver("driverStandings").collect().head
    assert(ds.getAs[Double]("points") == 50.0 && ds.getAs[Int]("wins") == 2 &&
      ds.getAs[String]("driverRef") == "alice" && ds.getAs[Int]("season") == 2021)
    val cs = silver("constructorStandings").collect().head
    assert(cs.getAs[Double]("points") == 86.0 &&
      cs.getAs[String]("constructorRef") == "redcars")
  }

  test("clean bronze produces the declared silver schemas") {
    val lake = Lake(lakeRoot)
    val cleaned = CleanBronze.run(spark, lake)
    assert(Set("circuits", "constructors", "drivers", "pitstops", "results")
      .subsetOf(cleaned.toSet))
    val results = spark.read.parquet(lake.silver("20240101_000000", "results"))
    assert(results.schema("points").dataType.typeName == "double")
    assert(results.schema("date").dataType.typeName == "date")
    assert(results.count() == 4)
    val circuits = spark.read.parquet(lake.silver("20240101_000000", "circuits"))
    assert(circuits.columns.toSet == Set("circuitRef", "circuitName", "aboutUrl",
      "country", "location", "latitude", "longitude", "ingestiondate"))
  }

  test("transform silver produces gold raceResults and exact standings") {
    val lake = Lake(lakeRoot)
    CleanBronze.run(spark, lake)
    val run = TransformSilver.run(spark, lake)
    val gp = spark.read.parquet(lake.gold(run, "raceResults"))
    assert(gp.count() == 4) // all results have pitstops → inner join keeps all
    assert(gp.columns.length == 16)
    val ds = spark.read.parquet(lake.gold(run, "driverStandings"))
      .select("year", "surname", "totalPoints", "wins", "position")
      .orderBy("position").collect()
    assert(ds.map(r => (r.getInt(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getInt(4))).toSeq ==
      Seq((2021, "alice", 50.0, 2L, 1), (2021, "bob", 36.0, 0L, 2)))
    val cs = spark.read.parquet(lake.gold(run, "constructorStandings"))
      .orderBy("position").collect()
    assert(cs.map(r => (r.getAs[String]("constructorName"), r.getAs[Int]("position"))).toSeq ==
      Seq(("redcars", 1), ("bluecars", 2)))
  }

  test("Q3 flag: left-join variant keeps results without pitstops") {
    val lake = Lake(lakeRoot)
    CleanBronze.run(spark, lake)
    val run = Lake.newestFolder(s"$lakeRoot/silver",
      spark.sparkContext.hadoopConfiguration).get
    val read = (ds: String) => spark.read.parquet(lake.silver(run, ds))
    // drop bob's pitstops in race 2 to create a pitstop-less result row
    val partialPits = read("pitstops").filter(
      !(col("driverRef") === "bob" && col("date") === "2021-04-11"))
    val inner = TransformSilver.raceResults(read("results"), read("drivers"),
      read("constructors"), read("circuits"), partialPits, "inner")
    val left = TransformSilver.raceResults(read("results"), read("drivers"),
      read("constructors"), read("circuits"), partialPits, "left")
    assert(inner.count() == 3) // Q3: bob's race-2 result silently dropped
    assert(left.count() == 4)
    assert(left.filter(col("surname") === "bob" && col("numberOfPitstops") === 0).count() == 1)
  }

  test("SQL reports: CTAS gate, aggregates, global rank, CTE top-k") {
    val lake = Lake(lakeRoot)
    CleanBronze.run(spark, lake)
    TransformSilver.run(spark, lake) // registers silver views
    val reports = SqlReports.run(spark, rankLimit = 15,
      minRacesDrivers = 1, minRacesConstructors = 1)
    val perYear = reports("dominantDriversPerYear").collect()
    assert(perYear.length == 2)
    // alice: adjusted 10 per race, avg 10; bob: 9
    assert(perYear.head.getAs[String]("driverName") == "alice alice")
    assert(perYear.head.getAs[Double]("avgAdjustedPoints") == 10.0)
    val rank = reports("allTimeDriverRank")
    val ranked = rank.collect()
    assert(ranked.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2))
    val top = reports("topDriversPerYear").collect()
    assert(top.nonEmpty && top.head.getAs[String]("driverName") == "alice alice")
  }

  test("silver database survives a JVM restart (Derby metastore)") {
    // the reference's CREATE DATABASE silver LOCATION ... lives in a
    // workspace metastore that outlives any one cluster/session; the
    // fidelity claim needs PROCESS separation, so each phase forks its
    // own JVM over the same metastore root (PersistentCatalogDemo)
    val root = Files.createTempDirectory("graft_metastore").toString
    val java = Paths.get(sys.props("java.home"), "bin", "java").toString
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def fork(phase: String): (Int, String) = {
      import scala.sys.process._
      val cmd = Seq(java) ++ addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", sys.props("java.class.path"),
        "graft.f1.PersistentCatalogDemo", root, phase)
      // ProcessLogger invokes the sink from two pump threads (stdout +
      // stderr); an unsynchronized StringBuilder can drop interleaved
      // appends under load — which read as "exit 0 but the CREATED line
      // is missing" flakes in full-suite runs
      val out = new StringBuilder
      val code = Process(cmd).!(ProcessLogger(l =>
        out.synchronized { out.append(l).append('\n'); () }))
      (code, out.synchronized(out.toString))
    }
    val (c1, o1) = fork("create")
    assert(c1 == 0 && o1.contains("CREATED report_rows=2"), o1.takeRight(4000))
    val (c2, o2) = fork("reopen")
    assert(c2 == 0, o2.takeRight(4000))
    // reopened JVM ran the full SqlReports flow from catalog metadata
    // alone: alice and bob, 2 races each in 2021, alice ranked first
    assert(o2.contains("PERSISTED 2021:alice alice:2,2021:bob bob:2"),
      o2.takeRight(4000))
  }

  test("ingest driver: pagination loop, page files, year guards") {
    val bronzeRoot = Files.createTempDirectory("f1bronze").toString
    var urls = Vector.empty[String]
    val fetcher = new PageFetcher {
      override def fetch(url: String): String = synchronized {
        urls :+= url
        // 2500 records → 3 pages at limit 1000
        if (url.contains("results")) """{"MRData": {"total": "2500", "RaceTable": {}}}"""
        else """{"MRData": {"total": "3", "RaceTable": {}}}"""
      }
    }
    val ingest = new ErgastIngest(fetcher, new LocalPageSink(bronzeRoot),
      baseUrl = "http://test/api/f1", requestIntervalMs = 0)
    ingest.run("run1", Seq("results"), Seq(1995, 2015), _ => Seq(1))
    val pages = Files.list(Paths.get(bronzeRoot, "run1", "results")).toArray.map(_.toString).sorted
    assert(pages.length == 3, s"pages: ${pages.toSeq}")
    assert(pages.head.endsWith("results_1.json"))
    // guards: 1995 → schedule only; 2015 → schedule + laps + pitstops
    assert(Files.exists(Paths.get(bronzeRoot, "run1", "schedule")))
    val lapsUrls = urls.filter(_.contains("/laps"))
    val pitUrls = urls.filter(_.contains("/pitstops"))
    assert(lapsUrls.forall(_.contains("2015")) && lapsUrls.nonEmpty)
    assert(pitUrls.forall(_.contains("2015")) && pitUrls.nonEmpty)
  }

  test("config lookup parses endpoint list") {
    val p = Files.createTempFile("endpoints", ".json")
    Files.write(p, """[{"endPoint": "circuits"}, {"endPoint": "drivers"}]"""
      .getBytes(StandardCharsets.UTF_8))
    assert(IngestConfig.endpoints(p.toString) == Seq("circuits", "drivers"))
  }
}
