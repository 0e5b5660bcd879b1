package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.expressions.PpjVerify

/**
 * Kernel-level properties of the PPJoin verifier: pruning must NEVER
 * disagree with brute-force intersection at the jaccard threshold —
 * the filters are allowed to return -1 only for pairs the final
 * `jac >= t` filter would drop. Exercised exhaustively over random
 * sorted token sets (deterministic seed) at several thresholds,
 * including fp-boundary set sizes.
 */
class PpjVerifySpec extends AnyFunSuite {

  private def arr(toks: Seq[String]): GenericArrayData =
    new GenericArrayData(toks.map(s => UTF8String.fromString(s): AnyRef).toArray)

  test("minOverlap is the exact smallest integer passing the double-domain filter") {
    for (szA <- 1 to 40; szB <- 1 to 40; t <- Seq(0.2, 0.35, 0.5, 0.75, 0.9)) {
      val m = PpjVerify.minOverlap(szA, szB, t)
      val mMax = math.min(szA, szB)
      if (m == Int.MaxValue) {
        assert(mMax.toDouble / (szA + szB - mMax) < t, s"($szA,$szB,$t)")
      } else {
        assert(m.toDouble / (szA + szB - m) >= t, s"($szA,$szB,$t) m=$m")
        assert(m == 1 || (m - 1).toDouble / (szA + szB - (m - 1)) < t, s"($szA,$szB,$t) m=$m")
      }
    }
  }

  test("verify returns the exact intersection for every above-threshold pair (random sets)") {
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 200).map(i => f"tok$i%04d")
    for (trial <- 0 until 2000) {
      val t = Seq(0.2, 0.35, 0.5, 0.8)(trial % 4)
      val a = rnd.shuffle(vocab).take(3 + rnd.nextInt(40)).sorted
      // partner: biased toward sharing a's tokens so near-dups occur
      val b = (a.filter(_ => rnd.nextDouble() < 0.7) ++
        rnd.shuffle(vocab).take(rnd.nextInt(15))).distinct.sorted
      if (b.nonEmpty) {
        val inter = a.toSet.intersect(b.toSet)
        // seed = the FIRST shared token in sort order (what the prefix
        // join's min-position aggregate feeds), if any
        val shared = a.filter(b.toSet)
        if (shared.nonEmpty) {
          val w = shared.min
          val pa = a.indexOf(w)
          val pb = b.indexOf(w)
          val got = PpjVerify.verify(arr(a), arr(b), pa, pb, t)
          val jac = inter.size.toDouble / (a.size + b.size - inter.size)
          if (jac >= t) {
            assert(got == inter.size,
              s"above-threshold pair must verify exactly: trial=$trial t=$t got=$got want=${inter.size}")
          } else {
            // below threshold: -1 (pruned) or the exact count, never a wrong count
            assert(got == -1 || got == inter.size,
              s"below-threshold result must be -1 or exact: trial=$trial t=$t got=$got want=${inter.size}")
          }
        }
      }
    }
  }

  test("UNSEEDED verify (-1/-1 — the production prefixPairs path) is exact on random sets") {
    // production always calls graft_ppj_verify with pa = pb = -1
    // (full-array suffix bound, merge from 0,0); give that path the
    // same direct kernel-level random-set assertions as the seeded one
    val rnd = new scala.util.Random(4242)
    val vocab = (0 until 200).map(i => f"tok$i%04d")
    for (trial <- 0 until 2000) {
      val t = Seq(0.2, 0.35, 0.5, 0.8)(trial % 4)
      val a = rnd.shuffle(vocab).take(3 + rnd.nextInt(40)).sorted
      val b = (a.filter(_ => rnd.nextDouble() < 0.7) ++
        rnd.shuffle(vocab).take(rnd.nextInt(15))).distinct.sorted
      if (b.nonEmpty) {
        val inter = a.toSet.intersect(b.toSet)
        val got = PpjVerify.verify(arr(a), arr(b), -1, -1, t)
        val jac = inter.size.toDouble / (a.size + b.size - inter.size)
        if (jac >= t) {
          assert(got == inter.size,
            s"above-threshold pair must verify exactly: trial=$trial t=$t got=$got want=${inter.size}")
        } else {
          assert(got == -1 || got == inter.size,
            s"below-threshold result must be -1 or exact: trial=$trial t=$t got=$got want=${inter.size}")
        }
      }
    }
  }

  test("verify prunes a long disjoint-suffix pair without full merge (suffix filter fires)") {
    // two docs sharing ONE rare token then totally disjoint suffixes:
    // jac far below threshold — the suffix filter's hamming bound
    // (|sa| + |sb| vs allowance) must reject without error
    val a = ("aaa0" +: (1 to 50).map(i => f"bbb$i%03d")).sorted
    val b = ("aaa0" +: (1 to 50).map(i => f"ccc$i%03d")).sorted
    val pa = a.indexOf("aaa0")
    val pb = b.indexOf("aaa0")
    assert(PpjVerify.verify(arr(a), arr(b), pa, pb, 0.35) == -1)
  }
}
