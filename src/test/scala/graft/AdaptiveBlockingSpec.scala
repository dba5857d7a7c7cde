package graft

import graft.operators.Similarity

/** The corpus-adaptive LSH sizing rule: P = max(floor, len(bin(N/32))).
  * The property that matters at scale is the occupancy envelope — once
  * N clears the floor, expected bucket occupancy N/2^P stays in
  * [16, 32), so intra-bucket candidate pairs grow LINEARLY with the
  * corpus instead of quadratically (the round-6 sf1 run measured 50×/27×
  * blowups under fixed-width blocking before this rule).
  */
class AdaptiveBlockingSpec extends SparkTestBase {

  test("plane count doubles buckets per corpus doubling; occupancy stays in [16, 32)") {
    assert(Similarity.adaptivePlanes(500) == 4)   // floor: tiny corpora unchanged
    assert(Similarity.adaptivePlanes(2000) == 6)  // sf0.1
    assert(Similarity.adaptivePlanes(20000) == 10) // sf1
    // monotone, and the envelope holds once past the floor
    var prev = 0
    for (exp <- 10 to 34) {
      val n = 1L << exp
      val p = Similarity.adaptivePlanes(n)
      assert(p >= prev, "plane count must be monotone in corpus size")
      prev = p
      val occupancy = n.toDouble / (1L << p)
      assert(occupancy >= 16.0 - 1e-9 && occupancy < 32.0 + 1e-9,
        s"n=$n p=$p occupancy=$occupancy outside [16,32)")
    }
    // a billion-vector corpus needs 26 planes — still a tiny bucket key
    assert(Similarity.adaptivePlanes(1L << 30) == 26)
  }
}
