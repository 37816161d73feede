package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Flatten, Normalize}

object SparkTestSession {
  // withExtensions: the same registration path library consumers get
  // (functions, planner strategy, optimizer rules, table functions),
  // so specs exercise the real wiring
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions)
    .getOrCreate()
}

class FlattenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def jsonDf(rows: String*) =
    spark.read.json(spark.createDataset(rows))

  test("flat input only gains *1 suffixes") {
    val df = jsonDf("""{"a": 1, "b": "x"}""")
    val out = Flatten.flatten(df)
    assert(out.columns.sorted.toSeq == Seq("a*1", "b*1"))
    assert(out.count() == 1)
  }

  test("struct expands to parent->child*level names") {
    val df = jsonDf("""{"top": {"c": 1, "d": {"e": "deep"}}}""")
    val out = Flatten.flatten(df)
    assert(out.columns.sorted.toSeq ==
      Seq("top*1->c*2", "top*1->d*2->e*3"))
    assert(out.select("`top*1->d*2->e*3`").as[String].head() == "deep")
  }

  test("arrays explode_outer with row multiplicity = array size") {
    val df = jsonDf(
      """{"id": 1, "xs": [10, 20, 30]}""",
      """{"id": 2, "xs": []}""",
      """{"id": 3}""")
    val out = Flatten.flatten(df)
    // explode_outer: empty/null arrays keep their row with null element
    assert(out.count() == 5)
    val nulls = out.filter(out("`xs*1`").isNull).select("`id*1`")
      .as[Long].collect().sorted.toSeq
    assert(nulls == Seq(2L, 3L))
  }

  test("array of structs explodes then expands") {
    val df = jsonDf("""{"id": 7, "hits": [{"p": 1}, {"p": 2}]}""")
    val out = Flatten.flatten(df)
    assert(out.columns.sorted.toSeq == Seq("hits*1->p*2", "id*1"))
    assert(out.select("`hits*1->p*2`").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
  }

  test("schema is fully flat after flatten (no structs/arrays remain)") {
    val df = jsonDf(
      """{"a": {"b": [{"c": {"d": 1}}, {"c": {"d": 2}}]}, "e": [[1, 2], [3]]}""")
    val out = Flatten.flatten(df)
    assert(out.schema.fields.forall(f =>
      !f.dataType.isInstanceOf[StructType] && !f.dataType.isInstanceOf[ArrayType]))
  }

  test("struct containing a field named like its parent hits the #1 rename") {
    // struct column "n" with child "n" — the reference's collision path
    // (Clean Bronze Data.py:82-84): parent temporarily renamed n#1
    val df = jsonDf("""{"n": {"n": 5, "m": 6}}""")
    val out = Flatten.flatten(df)
    assert(out.columns.sorted.toSeq == Seq("n*1->m*2", "n*1->n*2"))
    assert(out.select("`n*1->n*2`").as[Long].head() == 5L)
  }

  test("deep nesting increments levels per struct hop") {
    val df = jsonDf("""{"a": {"b": {"c": {"d": {"e": 42}}}}}""")
    val out = Flatten.flatten(df)
    assert(out.columns.toSeq == Seq("a*1->b*2->c*3->d*4->e*5"))
  }

  test("normalize renames, casts, and prunes to the declared schema") {
    val df = Flatten.flatten(jsonDf("""{"lat": "12.5", "extra": 1, "who": {"ref": "x"}}"""))
    val out = Normalize(df, Seq(
      Normalize.Field("lat*1", "latitude", Some(DoubleType)),
      Normalize.Field("who*1->ref*2", "ref")))
    assert(out.columns.toSeq == Seq("latitude", "ref"))
    assert(out.schema("latitude").dataType == DoubleType)
    assert(out.as[(Double, String)].head() == ((12.5, "x")))
  }
}
