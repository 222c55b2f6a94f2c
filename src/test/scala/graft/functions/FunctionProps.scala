package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the pure sketch/signature kernels (no Spark
  * session needed — `compute` helpers are static). */
object FunctionProps extends Properties("functions") {

  private def arr(ss: Seq[String]): GenericArrayData =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  val shingles: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString))

  property("minhash: signature has width k; empty set is all sentinels") =
    forAll(shingles, Gen.choose(1, 64)) { (ss, k) =>
      val sig = MinHashSig.compute(arr(ss), k)
      sig.length == k &&
        (ss.nonEmpty || sig.forall(_ == Long.MaxValue))
    }

  property("minhash: order-invariant (a set function)") =
    forAll(shingles) { ss =>
      val k = 16
      MinHashSig.compute(arr(ss), k)
        .sameElements(MinHashSig.compute(arr(ss.reverse), k))
    }

  property("minhash: superset minima are elementwise <=") =
    forAll(shingles, shingles) { (a, b) =>
      val k = 16
      val sa = MinHashSig.compute(arr(a), k)
      val sab = MinHashSig.compute(arr(a ++ b), k)
      sab.zip(sa).forall { case (u, v) => u <= v }
    }

  val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    1 -> Gen.const(' '),
    1 -> Gen.oneOf('é', '☃', '語'))).map(_.mkString)

  property("char shingle hashes == sorted distinct xxhash64(shingles)") =
    forAll(textGen, Gen.choose(2, 6)) { (s, n) =>
      import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64Function}
      import org.apache.spark.sql.catalyst.util.ArrayData
      import org.apache.spark.sql.types.StringType
      val fused = CharShingleHashes(Literal(s), n).eval(null)
        .asInstanceOf[ArrayData].toLongArray()
      val composed = CharShingles(Literal(s), n).eval(null)
        .asInstanceOf[ArrayData].toArray[UTF8String](StringType)
        .map(u => XxHash64Function.hash(u, StringType, 42L))
        .distinct.sorted
      s.isEmpty || fused.sameElements(composed)
    }

  val vec: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.choose(-10.0, 10.0)).map(_.toArray)

  property("lsh buckets: deterministic and within [0, 2^bits)") =
    forAll(vec) { v =>
      val (tables, bits, dim) = (4, 6, 8)
      val planes = LshBuckets.planes(tables, bits, dim)
      val data = new GenericArrayData(v)
      val b1 = LshBuckets.compute(planes, tables, bits, dim, data)
      val b2 = LshBuckets.compute(planes, tables, bits, dim, data)
      b1.sameElements(b2) && b1.length == tables &&
        b1.forall(b => b >= 0 && b < (1 << bits))
    }

  property("simhash votes: merge of split buffers == single-pass buffer") =
    forAll(Gen.listOf(Gen.long), Gen.listOf(Gen.long)) { (xs, ys) =>
      def fill(hs: Seq[Long]): Array[Int] = {
        val b = new Array[Int](64)
        hs.foreach { h =>
          var i = 0
          while (i < 64) { b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1); i += 1 }
        }
        b
      }
      val merged = fill(xs).zip(fill(ys)).map { case (p, q) => p + q }
      merged.sameElements(fill(xs ++ ys))
    }

  private val smallVec: Gen[Array[Double]] =
    Gen.listOfN(3, Gen.choose(-10.0, 10.0)).map(_.toArray)

  property("gram: split-and-merge == single pass == naive outer-product sum") =
    forAll(Gen.listOf(smallVec), Gen.listOf(smallVec)) { (xs, ys) =>
      val d = 3
      def fold(vs: Seq[Array[Double]]): Array[Long] = {
        val b = new Array[Long](d * d)
        vs.foreach { v =>
          for (i <- 0 until d; j <- 0 until d)
            b(i * d + j) += math.round(v(i) * v(j) * 1e6)
        }
        b
      }
      val merged = fold(xs).zip(fold(ys)).map { case (p, q) => p + q }
      val single = fold(xs ++ ys)
      // merge-order invariance (the TypedImperativeAggregate contract)
      // and symmetry of every resulting matrix
      merged.sameElements(single) &&
        (0 until d).forall(i => (0 until d).forall(j =>
          single(i * d + j) == single(j * d + i)))
    }

  private val hostLabel: Gen[String] = Gen.frequency(
    6 -> Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString),
    2 -> Gen.nonEmptyListOf(Gen.oneOf('b', 'ü', 'c', 'é', 'h'))
      .map(_.mkString),
    1 -> Gen.const("xn--bcher-kva"))
  private val hostGen: Gen[String] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, hostLabel).map(_.mkString(".")))

  property("idn host fold: idempotent, ascii output or passthrough, " +
      "ascii hosts identical (zero-copy fast path)") =
    forAll(hostGen) { h =>
      val u = UTF8String.fromString(h)
      val once = IdnHostAscii.toAscii(u)
      val twice = IdnHostAscii.toAscii(once)
      val labelsIn = h.split("\\.", -1)
      val labelsOut = once.toString.split("\\.", -1)
      // a fold is a projection; labels map 1:1; each output label is
      // either all-ASCII (converted) or the untouched input label
      // (JDK-rejected passthrough); all-ASCII input returns the same
      // object (the fast path is genuinely zero-copy)
      twice == once &&
        labelsOut.length == labelsIn.length &&
        labelsOut.zip(labelsIn).forall { case (o, i) =>
          o.forall(_ < 0x80) || o == i } &&
        (!h.forall(_ < 0x80) || (once eq u))
    }
}
