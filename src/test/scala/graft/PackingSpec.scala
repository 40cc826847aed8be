package graft

import graft.textops.{Packing, TextHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the concat-and-chunk packer: no token dropped or
  * duplicated, every non-final chunk exactly full, chunk ids dense,
  * and — the distributed-prefix-sum contract — results independent of
  * the partition count.
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = SparkTestBase.sf
  import spark.implicits._

  private val Cap = 512L

  test("seq_pack: full chunks, token conservation, dense chunk ids, monotone doc ranges") {
    val rows = Packing.seqPack(spark, sf, Cap)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // ids dense from 0, in order (query sorts by chunk_id)
    assert(rows.map(_._1).toSeq == rows.indices.map(_.toLong))
    // every chunk except the last is exactly full; none exceeds capacity
    assert(rows.init.forall(_._3 == Cap), "non-final chunk not full")
    assert(rows.last._3 <= Cap && rows.last._3 > 0)
    // conservation: chunk tokens sum to the corpus token count
    val total = Tables.documents(spark, sf)
      .selectExpr(s"cast(size(${TextHash.tokensSpark}) as bigint) as n")
      .where($"n" > 0).agg(sum($"n")).as[Long].head()
    assert(rows.map(_._3).sum == total)
    // doc ranges are contiguous in doc order: consecutive chunks either
    // straddle a doc (last_doc == next first_doc) or abut (next id)
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._4 >= a._5, s"doc range went backwards: $a -> $b")
      case _           => () // single-chunk corpus: nothing to compare
    }
  }

  test("seq_pack: partition-count independent (two-pass prefix sum is exact)") {
    val one = Packing.seqPack(spark, sf, Cap, numParts = 1).collect().toSeq
    val many = Packing.seqPack(spark, sf, Cap, numParts = 7).collect().toSeq
    assert(one == many)
  }

  test("doc_chunks: overlap reconstruction — chunk0 + later chunks minus overlap rebuilds every doc") {
    val chunk = 64
    val overlap = 16
    val byDoc = Packing.docChunks(spark, sf, chunk, overlap)
      .as[(Long, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", s"${TextHash.tokensSpark} as toks")
      .as[(Long, Seq[String])].collect().toMap
      .filter(_._2.nonEmpty)
    assert(byDoc.keySet == docs.keySet)
    byDoc.foreach { case (id, chunks) =>
      // chunk ids dense from 0
      assert(chunks.map(_._2).toSeq == chunks.indices)
      // every chunk's token count matches its text
      chunks.foreach { case (_, _, n, txt) =>
        assert(txt.split(" ").length.toLong == n)
        assert(n <= chunk)
      }
      // reconstruction: first chunk whole, later chunks drop the shared
      // overlap prefix — concatenation equals the original token stream
      val rebuilt = chunks.head._4.split(" ").toSeq ++
        chunks.tail.flatMap(_._4.split(" ").drop(overlap).toSeq)
      assert(rebuilt == docs(id), s"doc $id reconstruction mismatch")
      // consecutive chunks genuinely share the overlap
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          val at = a._4.split(" ")
          assert(at.takeRight(math.min(overlap, at.length))
            .mkString(" ") == b._4.split(" ").take(overlap).mkString(" ")
            || at.length < chunk) // short tail chunk: no full overlap
        case _ => ()
      }
    }
  }

  test("doc_chunks: chunk <= overlap is a readable precondition error, not a malformed plan") {
    val docs = Tables.documents(spark, sf)
    // chunk == overlap → stride 0 (division by zero deep in the plan)
    val eq = intercept[IllegalArgumentException] {
      Packing.docChunksFrom(docs, chunk = 16, overlap = 16)
    }
    assert(eq.getMessage.contains("overlap < chunk"))
    // chunk < overlap → negative stride (sequence stepping backwards)
    val lt = intercept[IllegalArgumentException] {
      Packing.docChunksFrom(docs, chunk = 8, overlap = 16)
    }
    assert(lt.getMessage.contains("overlap < chunk"))
    // the oracle builder enforces the same precondition
    intercept[IllegalArgumentException] { Packing.docChunksOracle(16, 16) }
    intercept[IllegalArgumentException] { Packing.chunkDedupOracle(8, 16) }
  }
}
