package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PackedShards: fixed-length rows, span bookkeeping, padding, and
  * the lossless reassembly inverse.
  */
class PackedShardsSpec extends SparkTestBase {
  import spark.implicits._

  test("packs: boundaries split, padding on the tail, spans invert exactly") {
    // A=[1,2,3] B=[4,5] C=[6,7,8,9] at L=4:
    //   pack0 = [1,2,3,4]  A(0,3) B(3,1)
    //   pack1 = [5,6,7,8]  B(0,1) C(1,3)
    //   pack2 = [9,-1,-1,-1]  C(0,1), n_real 1
    val docs = Seq(
      (1L, Seq(1L, 2L, 3L)), (2L, Seq(4L, 5L)), (3L, Seq(6L, 7L, 8L, 9L)))
      .toDF("doc_id", "ids")
    val packed = PackedShards.packs(docs, col("doc_id"), col("ids"), 4,
      padId = -1L)
    val rows = packed.orderBy(col("pack_id")).collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getSeq[Long](1).size === 4),
      "every sequence is exactly seqLen ids")
    assert(rows(0).getSeq[Long](1) === Seq(1L, 2L, 3L, 4L))
    assert(rows(1).getSeq[Long](1) === Seq(5L, 6L, 7L, 8L))
    assert(rows(2).getSeq[Long](1) === Seq(9L, -1L, -1L, -1L))
    assert(rows.map(_.getInt(2)).toSeq === Seq(4, 4, 1), "n_real")
    def spans(r: org.apache.spark.sql.Row): Seq[(Long, Int, Int)] =
      r.getSeq[org.apache.spark.sql.Row](3)
        .map(s => (s.getLong(0), s.getInt(1), s.getInt(2)))
    assert(spans(rows(0)) === Seq((1L, 0, 3), (2L, 3, 1)))
    assert(spans(rows(1)) === Seq((2L, 0, 1), (3L, 1, 3)))
    assert(spans(rows(2)) === Seq((3L, 0, 1)))
    // reassembly = the serial assignment, all spans contiguous
    val back = PackedShards.reassemble(packed, 4)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(back.toSeq === Seq(
      (1L, 3L, 0L, 0L, true), (2L, 2L, 0L, 3L, true), (3L, 4L, 1L, 1L, true)))
  }

  test("a document longer than several sequences tiles them all") {
    val docs = Seq((1L, (1L to 10L).toSeq), (2L, Seq(11L, 12L)))
      .toDF("doc_id", "ids")
    val packed = PackedShards.packs(docs, col("doc_id"), col("ids"), 3, -1L)
    val rows = packed.orderBy(col("pack_id")).collect()
    assert(rows.length === 4)
    assert(rows.flatMap(_.getSeq[Long](1)).takeWhile(_ > 0).toSeq
      === (1L to 12L).toSeq, "global order reconstructs the corpus stream")
    val back = PackedShards.reassemble(packed, 3)
      .orderBy(col("doc_id")).collect()
    assert(back(0).getLong(1) === 10L && back(0).getBoolean(4))
    assert((back(1).getLong(2), back(1).getLong(3)) === (3L, 1L),
      "doc 2 starts at token 10 = pack 3 offset 1")
    // zero-token docs occupy no slots and break nothing
    val withEmpty = Seq((1L, Seq(1L)), (2L, Seq.empty[Long]), (3L, Seq(2L)))
      .toDF("doc_id", "ids")
    val p2 = PackedShards.packs(withEmpty, col("doc_id"), col("ids"), 4, -1L)
    assert(p2.select(explode(col("doc_spans.doc_id"))).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }
}
