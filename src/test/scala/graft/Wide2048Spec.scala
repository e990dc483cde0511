package graft

import graft.queries.HybridQueries

/** A45/A45b: the 2048-d gate entries (the reference's actual build
  * dimensionality, reference acorn.py:30–40). These specs re-derive both
  * results from an INDEPENDENT plain-Scala reconstruction — the wide
  * construction, the float rounds, and the sequential float→double L2
  * accumulation all re-implemented without Spark expressions — so an
  * engine-side expression bug and its oracle transliteration cannot
  * cancel out (the FunnelSpec convention).
  */
class Wide2048Spec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = HybridQueries.defs(name)(spark, dir)

  private val Dims = 64
  private val WideDims = 2048

  /** wide[j] = base[((j%64)+(j/64))%64] · ((j/64)%5 + (j%64)%3 + 1),
    * one float round — plain Scala, no Spark. */
  private def widen(base: Array[Float]): Array[Float] =
    Array.tabulate(WideDims) { j =>
      val src = ((j % Dims) + (j / Dims)) % Dims
      val mult = (j / Dims) % 5 + (j % Dims) % 3 + 1
      (base(src).toDouble * mult).toFloat
    }

  /** floor(||a − b||·10⁴ + 0.5) with the kernel's exact accumulation:
    * per-element float→double widen, sequential double sum. */
  private def l2Scaled(a: Array[Float], b: Array[Float]): Long = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
    math.floor(math.sqrt(acc) * 10000 + 0.5).toLong
  }

  private def wideCorpus(): Map[Long, Array[Float]] =
    Tables(spark, dir, "embeddings").select("vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> widen(r.getSeq[Float](1).toArray)).toMap

  test("knn_exact_l2_2048 equals the plain-Scala 2048-d reconstruction (self excluded)") {
    val w = wideCorpus()
    assert(w.values.head.length == WideDims)
    val qv = w(0L)
    val expect = w.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = q("knn_exact_l2_2048").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("knn_hnsw_2048: saturated persisted 2048-d graph walk equals exact (self included)") {
    val w = wideCorpus()
    val qv = w(13L)
    val expect = w.toSeq
      .map { case (id, v) => (id, l2Scaled(v, qv)) }
      .sortBy { case (id, s) => (s, id) }.take(10)
    val got = q("knn_hnsw_2048").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    // the walk found the query itself — it is an indexed item
    assert(got.exists { case (id, s) => id == 13L && s == 0L })
  }
}
