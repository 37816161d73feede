package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lineage

/** The iterative queries (q71 connected components, q111 PageRank) must
  * produce identical results under both lineage-cut postures: the
  * default executor-memory localCheckpoint and the reliable
  * checkpoint(dir) a fault-tolerant cluster run configures via
  * spark.graft.checkpoint.dir.
  */
class LineageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def withReliableDir[T](f: => T): T = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Lineage.DirKey, dir)
    try f finally {
      spark.conf.unset(Lineage.DirKey)
      // leave sc.checkpointDir as-is; only the conf key routes Lineage
    }
  }

  test("q71 CC results are identical under local and reliable checkpointing") {
    val local = graft.dedup.Clusters.q71DedupClusters(spark, sf)
      .collect().map(_.toSeq).toSeq
    val reliable = withReliableDir {
      graft.dedup.Clusters.q71DedupClusters(spark, sf)
        .collect().map(_.toSeq).toSeq
    }
    assert(local == reliable)
  }

  test("q111 PageRank results are identical under local and reliable checkpointing") {
    val local = graft.queries.Advanced.q111PageRank(spark, sf)
      .collect().map(_.toSeq).toSeq
    val reliable = withReliableDir {
      graft.queries.Advanced.q111PageRank(spark, sf)
        .collect().map(_.toSeq).toSeq
    }
    assert(local == reliable)
  }

  test("reliable mode actually writes checkpoint data to the configured dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_probe")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      Lineage.cut(spark.range(100).toDF("id")).count()
      val written = java.nio.file.Files.walk(dir).filter(p =>
        java.nio.file.Files.isRegularFile(p)).count()
      assert(written > 0, s"no checkpoint files under $dir")
    } finally spark.conf.unset(Lineage.DirKey)
  }

  test("chained cuts delete the previous round's checkpoint dir (bounded growth)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_chain")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      def rddDirs(): Seq[String] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("rdd-"))
          .map(_.toString).toSeq
      }
      // a pinned (un-chained) cut must survive the whole loop
      val pinned = Lineage.cut(spark.range(50).toDF("id"))
      val pinnedDirs = rddDirs().toSet
      assert(pinnedDirs.nonEmpty)
      var df = spark.range(1000).toDF("id")
      for (_ <- 1 to 6) {
        df = Lineage.cut(
          df.selectExpr("id + 1 AS id"), chain = "spec_chain")
        // every round: exactly the pinned dir(s) + the chain's CURRENT dir
        assert(rddDirs().size <= pinnedDirs.size + 1,
          s"checkpoint dir grew unboundedly: ${rddDirs()}")
      }
      // both frames still readable: chain's live round + pinned cut intact
      assert(df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
        == (0L until 1000L).map(_ + 6).sum)
      assert(pinned.count() == 50)
    } finally spark.conf.unset(Lineage.DirKey)
  }

  test("endChain drops bookkeeping: a finished loop's final dir survives a later same-name chain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_end")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      def rddDirs(): Set[String] = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala
          .filter(p => java.nio.file.Files.isDirectory(p) &&
            p.getFileName.toString.startsWith("rdd-"))
          .map(_.getFileName.toString).toSet
      }
      val done = Lineage.cut(spark.range(10).toDF("id"), chain = "spec_end")
      val finalDirs = rddDirs()
      assert(finalDirs.nonEmpty)
      Lineage.endChain(done, "spec_end")
      // a NEW loop reusing the chain name must not delete the finished
      // loop's surviving dir (bookkeeping was dropped, not inherited)
      Lineage.cut(spark.range(20).toDF("id"), chain = "spec_end").count()
      assert(finalDirs.subsetOf(rddDirs()),
        s"finished chain's final dir was deleted: $finalDirs vs ${rddDirs()}")
      assert(done.count() == 10) // still readable off its checkpoint
    } finally spark.conf.unset(Lineage.DirKey)
  }

  test("reliable cuts run concurrently without cross-chain interference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_conc")
    spark.conf.set(Lineage.DirKey, dir.toString)
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration._
      val loops = (1 to 3).map { k =>
        Future {
          var df = spark.range(100L * k).toDF("id")
          val chain = s"conc_$k@${java.util.UUID.randomUUID()}"
          for (_ <- 1 to 4)
            df = Lineage.cut(df.selectExpr("id + 1 AS id"), chain = chain)
          val got = df.agg(org.apache.spark.sql.functions.sum("id"))
            .head.getLong(0)
          Lineage.endChain(df, chain)
          got == (0L until 100L * k).map(_ + 4).sum
        }
      }
      assert(Await.result(Future.sequence(loops), 120.seconds).forall(identity))
    } finally spark.conf.unset(Lineage.DirKey)
  }
}
