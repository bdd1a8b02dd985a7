package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KmvSketch

/** Contract of [[operators.KmvSketch]]: the finished sketch is EXACTLY the
  * k smallest distinct hash values — independent of insertion order,
  * chunking, and merge tree (that exactness is what lets the q313 oracle
  * restate estimates verbatim) — and the KMV estimator lands where the
  * theory says on known-cardinality inputs. */
class KmvSketchSpec extends AnyFunSuite {

  private val M = 1L << 56

  /** 56-bit mixing hash (splitmix-style) — stands in for the md5-derived
    * uniform the queries use; the spec only needs good dispersion. */
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) & (M - 1)
  }

  private def build(data: Seq[Long], k: Int, chunks: Int): Array[Long] = {
    val agg = new KmvSketch.Agg(k)
    val bufs = data.grouped(math.max(1, data.size / chunks)).map { c =>
      c.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    }.toSeq
    agg.finish(bufs.reduce(agg.merge)).mins
  }

  test("sketch is exactly the k smallest distinct hashes, any merge shape") {
    val data = (1 to 20000).map(i => mix(i.toLong)) ++
      (1 to 5000).map(i => mix(i.toLong)) // heavy duplicates
    val expect = data.distinct.sorted.take(64)
    for (chunks <- Seq(1, 3, 17, 64)) {
      val got = build(data, 64, chunks)
      assert(got.sameElements(expect), s"chunks=$chunks")
    }
    // reversed insertion order — same sketch
    assert(build(data.reverse, 64, 7).sameElements(expect))
  }

  test("fewer than k distinct values → the sketch IS the set, exactly") {
    val data = Seq(5L, 1L, 9L, 5L, 1L, 3L)
    assert(build(data, 64, 2).sameElements(Array(1L, 3L, 5L, 9L)))
  }

  test("KMV estimator lands near known cardinalities") {
    for (n <- Seq(5000, 50000)) {
      val data = (1 to n).map(i => mix(i.toLong))
      val mins = build(data, 256, 11)
      // (k−1)·2^56 overflows Long at k=256 — BigInt here; the q313 query
      // uses k=64 whose numerator 63·2^56 fits a BIGINT in both engines
      val est = (BigInt(255) * M / mins(255)).toLong
      val err = math.abs(est - n).toDouble / n
      // deterministic inputs → this is a constant; 1/sqrt(k) ≈ 6%
      // standard error, 4 sigma band
      assert(err < 0.25, s"n=$n est=$est err=$err")
    }
  }

  test("union/intersection estimates from sketch contents alone") {
    // two overlapping sets: A = 1..30000, B = 20001..50000 (|∩| = 10000)
    val k = 256
    val a = build((1 to 30000).map(i => mix(i.toLong)), k, 5)
    val b = build((20001 to 50000).map(i => mix(i.toLong)), k, 5)
    val merged = (a ++ b).distinct.sorted.take(k)
    val unionEst = (BigInt(k - 1) * M / merged(k - 1)).toLong
    val theta = merged(k - 1)
    val j = a.toSet.intersect(b.toSet).count(_ <= theta)
    val interEst = j.toLong * unionEst / k
    assert(math.abs(unionEst - 50000).toDouble / 50000 < 0.25, s"union=$unionEst")
    assert(math.abs(interEst - 10000).toDouble / 10000 < 0.40, s"inter=$interEst")
  }
}
