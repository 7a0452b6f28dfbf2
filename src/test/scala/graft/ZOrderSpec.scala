package graft

import graft.operators.ZOrder
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  private def morton(a: Long, b: Long): Long =
    (0 until 16).map(i =>
      (((a >> i) & 1L) << (2 * i)) + (((b >> i) & 1L) << (2 * i + 1))).sum

  test("z-values match the reference interleave; scaling fills 16 bits") {
    val rows = ZOrder.zorderLayout(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    rows.foreach { case (k, ck, dy, z, zg) =>
      assert(ck >= 0 && ck <= 65535 && dy >= 0 && dy <= 65535)
      assert(z == morton(ck, dy), s"order $k")
      assert(zg == (z >> 28))
    }
    // min-max scaling uses the full range on both dims (the property
    // raw-value interleaving lacks on narrow-range columns)
    assert(rows.map(_._2).max == 65535 && rows.map(_._2).min == 0)
    assert(rows.map(_._3).max == 65535 && rows.map(_._3).min == 0)
  }

  test("each 4-bit zgroup confines BOTH dimensions to a 2^14 quadrant") {
    val rows = ZOrder.zorderLayout(spark, sf, groupBits = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(rows.map(_._3).distinct.length > 1, "grouping degenerated")
    rows.groupBy(_._3).foreach { case (zg, g) =>
      val (cks, dys) = (g.map(_._1), g.map(_._2))
      // top 4 z bits fix (dy15, ck15, dy14, ck14): the group's
      // bounding box on EACH dimension spans at most one 16384-wide
      // quadrant strip — the footer-stats-skipping guarantee
      assert(cks.max - cks.min < (1L << 14), s"zgroup $zg ck span")
      assert(dys.max - dys.min < (1L << 14), s"zgroup $zg dy span")
    }
  }
}
