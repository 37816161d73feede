package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TxTable

/** Model-based fuzz of the transactional table: random operation
  * sequences (overwrite / append / clustered+bloomed append / keyed
  * merge both paths / range delete / MoR deleteWhere / purgeDeletes /
  * optimize / vacuum / restore / partitioned overwrite / dynamic
  * partition overwrite) applied simultaneously to a TxTable and to an
  * in-memory reference model, asserting after EVERY op that the visible
  * table equals the model — and that every RETAINED version still
  * time-travels to the model state it published. The
  * targeted TxTableSpec cases pin each mechanism; this pins their
  * COMPOSITION under interleavings nobody thought to write, which is
  * where manifest/stat/null-handling bugs actually live (the r11
  * deleteRange null-drop survived 4 rounds of targeted tests precisely
  * because no test put nulls in a stat-contained file). Seeded — every
  * run replays the identical sequences.
  */
class TxTableFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // nullable key, value, non-null partition tag
  private type Row_ = (Option[Long], Long, String)
  private type Model = Vector[Row_]

  private def toDf(rows: Seq[Row_]) = {
    import spark.implicits._
    rows.toDF("k", "v", "p")
  }

  private def rowOf(r: org.apache.spark.sql.Row): Row_ =
    (if (r.isNullAt(0)) None else Some(r.getLong(0)),
      r.getLong(1), r.getString(2))

  private def readSorted(root: String): Vector[Row_] =
    TxTable.read(spark, root).collect().map(rowOf).toVector.sorted

  private def genRows(rnd: scala.util.Random, n: Int): Vector[Row_] =
    Vector.fill(n)((
      if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(50).toLong),
      rnd.nextInt(1000).toLong,
      s"p${rnd.nextInt(3)}"))

  test("random op sequences: table == model after every op; retained " +
      "versions time-travel to their recorded states") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 3).foreach { trial =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_txfuzz_")
      try {
        val root = s"$tmp/t"
        var model: Model = genRows(rnd, 5 + rnd.nextInt(10))
        TxTable.commit(spark, root, toDf(model))
        // version -> expected model state, pruned as vacuum drops them
        var history = Map(TxTable.currentVersion(root).get -> model)
        val opsLog = new scala.collection.mutable.ArrayBuffer[String]
        (1 to 16).foreach { _ =>
          val op = rnd.nextInt(13)
          op match {
            case 0 => // overwrite
              model = genRows(rnd, 3 + rnd.nextInt(8))
              TxTable.commit(spark, root, toDf(model))
              opsLog += "overwrite"
            case 1 => // plain append
              val rows = genRows(rnd, 1 + rnd.nextInt(6))
              model = model ++ rows
              TxTable.commit(spark, root, toDf(rows), TxTable.Append)
              opsLog += "append"
            case 2 => // clustered append: stats (and sometimes blooms)
              val rows = genRows(rnd, 1 + rnd.nextInt(6))
              model = model ++ rows
              TxTable.commit(spark, root,
                toDf(rows).repartitionByRange(2, col("k")),
                TxTable.Append, statsCols = Seq("k"),
                bloomCols = if (rnd.nextBoolean()) Seq("v") else Seq.empty)
              opsLog += "appendStats"
            case 3 | 4 => // keyed merge — both code paths, same semantics
              val upd = genRows(rnd, 1 + rnd.nextInt(4))
                .filter(_._1.nonEmpty) // null-key updates: see mergeByKey
              if (upd.nonEmpty) {
                val keys = upd.map(_._1).toSet
                // replace-or-insert: matched keys' base rows drop; EVERY
                // update row lands (Upsert.mergeByKey unions the update
                // side verbatim — duplicate update keys both survive)
                val u = upd
                model = model.filterNot(r => keys.contains(r._1)) ++ u
                if (rnd.nextBoolean()) {
                  TxTable.mergeByKey(spark, root, toDf(u), Seq("k"))
                  opsLog += "mergeByKey"
                } else {
                  TxTable.mergeByKeyPruned(spark, root, toDf(u), "k")
                  opsLog += "mergeByKeyPruned"
                }
              }
            case 5 => // range delete (null keys must survive)
              val lo = rnd.nextInt(40).toLong
              val hi = lo + rnd.nextInt(15).toLong
              val next = model.filterNot(r =>
                r._1.exists(k => k >= lo && k <= hi))
              if (next.nonEmpty) { // deleteRange refuses to empty a table
                model = next
                TxTable.deleteRange(spark, root, "k", lo.toDouble,
                  hi.toDouble)
                opsLog += s"delete[$lo,$hi]"
              }
            case 6 => // optimize: visible content must not change
              TxTable.optimize(spark, root, 1 + rnd.nextInt(3),
                clusterBy = if (rnd.nextBoolean()) Seq("k") else Seq.empty)
              opsLog += "optimize"
            case 7 => // vacuum: drops old versions, content unchanged
              val keep = 1 + rnd.nextInt(3)
              TxTable.vacuum(root, keepVersions = keep)
              opsLog += s"vacuum($keep)"
            case 8 => // MoR deleteWhere on the VALUE column (nulls in k
              // are irrelevant to a v predicate; deleting every row is
              // legal for MoR — the files stay, all positions DV out)
              val lo = rnd.nextInt(900).toLong
              val hi = lo + rnd.nextInt(300).toLong
              model = model.filterNot(r => r._2 >= lo && r._2 <= hi)
              TxTable.deleteWhere(spark, root,
                col("v") >= lo && col("v") <= hi)
              opsLog += s"deleteWhere[$lo,$hi]"
            case 9 => // purge: materializes DVs, content unchanged
              if (model.nonEmpty) { // purge refuses to empty a table
                TxTable.purgeDeletes(spark, root)
                opsLog += "purge"
              }
            case 10 => // restore to a random retained version
              val retained = TxTable.versions(root)
              val target = retained(rnd.nextInt(retained.size))
              model = history(target)
              TxTable.restore(spark, root, target)
              opsLog += s"restore($target)"
            case 11 => // partitioned overwrite: every file classified
              model = genRows(rnd, 3 + rnd.nextInt(8))
              TxTable.commit(spark, root, toDf(model),
                partitionBy = Some("p"))
              opsLog += "overwriteP"
            case 12 => // dynamic partition overwrite — succeeds only
              // while EVERY parent file carries a part line (i.e. since
              // the last partitioned overwrite with no unpartitioned
              // writer in between); otherwise the designed loud refusal,
              // which the fuzz asserts INSTEAD of a silent wrong answer
              val pv = s"p${rnd.nextInt(3)}"
              val rows = genRows(rnd, 1 + rnd.nextInt(5))
                .map(r => (r._1, r._2, pv))
              try {
                TxTable.overwritePartitions(spark, root, toDf(rows), "p")
                model = model.filterNot(_._3 == pv) ++ rows
                opsLog += s"dpo($pv)"
              } catch {
                case e: java.io.IOException =>
                  assert(e.getMessage.contains(
                    "no recorded partition value"), e.getMessage)
                  opsLog += s"dpo($pv):refused"
              }
          }
          // record whatever version is now current against the model —
          // ops that no-op'd (empty delete match, DV-free purge) left
          // both unchanged, so the entry is idempotent
          history += (TxTable.currentVersion(root).get -> model)
          val ctx = s"trial $trial after ${opsLog.mkString(" → ")}"
          assert(readSorted(root) == model.sorted, ctx)
          // retained versions still read as the state they published
          val retained = TxTable.versions(root).toSet
          history = history.view.filterKeys(retained.contains).toMap
          history.foreach { case (v, m) =>
            val got = TxTable.readVersion(spark, root, v).collect()
              .map(rowOf).toVector.sorted
            assert(got == m.sorted, s"$ctx: version $v diverged")
          }
        }
      } finally graft.streaming.Replay.deleteRecursively(tmp)
    }
  }
}
