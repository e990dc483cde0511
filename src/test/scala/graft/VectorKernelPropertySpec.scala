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
}
