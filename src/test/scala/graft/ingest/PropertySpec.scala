package graft.ingest

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks for the pure ingest functions (SURVEY.md §5.3). */
object IngestProps extends Properties("ingest") {

  val nameGen: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('&', '@', '%', '-', '_', ' ', '.', '!', '#'),
    1 -> Gen.oneOf('ä', 'é', '☃'))).map(_.mkString)

  property("sanitize is idempotent") = forAll(nameGen) { s =>
    Sanitize(Sanitize(s)) == Sanitize(s)
  }

  property("sanitize output is \\w*") = forAll(nameGen) { s =>
    Sanitize(s).forall(c => c.isLetterOrDigit || c == '_') ||
      // non-ASCII letters survive Java's ASCII \W as-is, matching JS
      Sanitize(s).exists(c => c > 127)
  }

  property("categorical threshold is monotone in scan fraction") =
    forAll(Gen.choose(1000L, 10000000L)) { n =>
      // scanning more of the data can only raise (or keep) the threshold
      val scans = Seq(n / 100, n / 10, n / 2, n).filter(_ > 0)
      val ts = scans.map(sc => Categorical.threshold(n, sc))
      ts.zip(ts.tail).forall { case (a, b) => a <= b }
    }

  property("scanCount bounds: >= min(n,1000), <= cap") =
    forAll(Gen.choose(0L, 100000000L)) { n =>
      val sc = TypeInference.scanCount(n)
      sc >= math.min(n, 1000L) && sc <= math.max(TypeInference.DefaultScanCap, 1000L)
    }

  val nullToken: Gen[String] = Gen.oneOf(Nulls.NullSet)
  property("null set membership is exact (no trimming, no case folding)") =
    forAll(nullToken) { t =>
      val upper = t.toUpperCase
      Nulls.NullSet.contains(t) &&
        (upper == t || !Nulls.NullSet.contains(upper))
    }
}
