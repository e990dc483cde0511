package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.vectors

/** Property-style checks of the codegen'd kernels against straightforward
  * double-precision reference math, over seeded random vectors. */
class VectorKernelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val pairGen: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.choose(2, 16)
    a <- Gen.listOfN(n, Gen.choose(-100f, 100f)).map(_.toArray)
    b <- Gen.listOfN(n, Gen.choose(-100f, 100f)).map(_.toArray)
  } yield (a, b)

  private def sample(i: Int): (Array[Float], Array[Float]) =
    pairGen.pureApply(Gen.Parameters.default, Seed(42L + i))

  private def run(pairs: Seq[(Array[Float], Array[Float])]): Seq[(Double, Double, Double)] =
    pairs.toDF("a", "b")
      .select(vectors.dot(col("a"), col("b")).as("d"),
        vectors.l2(col("a"), col("b")).as("l"),
        vectors.cosine(col("a"), col("b")).as("c"))
      .as[(Double, Double, Double)].collect().toSeq

  test("kernels match double-precision reference math on 50 random vector pairs") {
    val pairs = (0 until 50).map(sample)
    run(pairs).zip(pairs).foreach { case ((d, l, c), (a, b)) =>
      val refDot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val refL2 = math.sqrt(a.zip(b).map { case (x, y) => val t = x.toDouble - y.toDouble; t * t }.sum)
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      assert(math.abs(d - refDot) <= 1e-6 * (1 + math.abs(refDot)))
      assert(math.abs(l - refL2) <= 1e-6 * (1 + refL2))
      assert(math.abs(c - refDot / (na * nb)) <= 1e-9)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("cosine is symmetric") {
    val pairs = (100 until 110).map(sample)
    val fwd = run(pairs).map(_._3)
    val rev = run(pairs.map(_.swap)).map(_._3)
    fwd.zip(rev).foreach { case (c1, c2) => assert(math.abs(c1 - c2) <= 1e-12) }
  }

  // r12 kernels: each EXACTLY equals a plain-Scala reference on seeded
  // random input (integer outputs, so equality is bitwise, no tolerance)

  test("Sq8QuantizeVec matches the plain reference on 50 random vectors") {
    val vecs = (200 until 250).map(sample).map(_._1)
    val mn = vecs.flatten.min.toDouble - 1.0
    val mx = vecs.flatten.max.toDouble + 1.0
    val got = vecs.map(v => Tuple1(v)).toDF("v")
      .selectExpr("CAST(v AS ARRAY<DOUBLE>) AS v", s"CAST($mn AS DOUBLE) AS mn",
        s"CAST($mx AS DOUBLE) AS mx")
      .select(vectors.sq8(col("v"), col("mn"), col("mx")).as("q"))
      .as[Array[Long]].collect()
    got.zip(vecs).foreach { case (q, v) =>
      val ref = v.map(x => math.floor(((x.toDouble - mn) * 255.0) / (mx - mn)).toLong)
      assert(q.sameElements(ref))
    }
  }

  test("SqDistLong and HammingDistLong match plain references on 50 random pairs") {
    val pairs = (300 until 350).map(sample)
    val got = pairs.toDF("a", "b")
      .select(vectors.quantize(col("a")).as("qa"), vectors.quantize(col("b")).as("qb"))
      .select(vectors.sqDistLong(col("qa"), col("qb")).as("d"),
        vectors.hammingLong(col("qa"), col("qb")).as("h"),
        col("qa"), col("qb"))
      .as[(Long, Long, Array[Long], Array[Long])].collect()
    got.foreach { case (d, h, qa, qb) =>
      val refD = qa.zip(qb).map { case (x, y) => val t = x - y; t * t }.sum
      val refH = qa.zip(qb).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum.toLong
      assert(d == refD && h == refH)
    }
  }

  test("BqPackVec round-trips every sign bit on 50 random vectors") {
    // pad to a whole number of 32-bit groups, pack, then re-derive each
    // sign from the packed bits — a lossless property, not just a spot value
    val vecs = (400 until 450).map(i => sample(i)._1)
      .map(v => v ++ Array.fill((32 - v.length % 32) % 32)(-1.0f))
    val groups = vecs.map(_.length / 32)
    val got = vecs.zip(groups).map { case (v, g) =>
      Seq(Tuple1(v)).toDF("v")
        .select(vectors.bqPack(col("v"), g).as("p"))
        .as[Array[Long]].head()
    }
    got.zip(vecs).foreach { case (p, v) =>
      v.indices.foreach { i =>
        val bit = (p(i / 32) >> (i % 32)) & 1L
        assert((bit == 1L) == (v(i) > 0.0f), s"sign bit $i wrong")
      }
    }
  }

  test("WidenVec matches the plain index/multiplier reference on 20 random 64-d vectors") {
    val dims = 64; val wide = 2048
    val vecs = (500 until 520).map { i =>
      Gen.listOfN(dims, Gen.choose(-100f, 100f)).map(_.toArray)
        .pureApply(Gen.Parameters.default, Seed(9000L + i))
    }
    val got = vecs.map(v => Tuple1(v)).toDF("v")
      .select(vectors.widen(col("v"), dims, wide).as("w"))
      .as[Array[Float]].collect()
    got.zip(vecs).foreach { case (w, v) =>
      val ref = Array.tabulate(wide) { j =>
        val src = ((j % dims) + (j / dims)) % dims
        val mult = (j / dims) % 5 + (j % dims) % 3 + 1
        (v(src).toDouble * mult).toFloat
      }
      assert(w.sameElements(ref))
    }
  }
}
