package graft.functions

/** Deterministic seeded RNG matching the reference's model initialization
  * (reference: src/artm/core/helpers.cc:79-140 `GenerateRandomVector`) so a
  * fixed seed yields the same Phi init across runs AND across partitionings
  * — the property the reference tests in repeatable_result_test.cc.
  *
  * The reference seeds boost::mt19937 (identical algorithm to std::mt19937,
  * i.e. the textbook MT19937 with Knuth-style initialization) with a 64-bit
  * polynomial hash of (class_id, token, seed) truncated to uint32, then
  * draws uniform floats as float(u32) / 2^32 and L1-normalizes the vector.
  */
object Rng {

  /** Textbook MT19937 (Matsumoto & Nishimura 1998), as in std/boost. */
  final class Mt19937(seed: Int) {
    private val N = 624
    private val mt = new Array[Int](N)
    private var mti = N
    mt(0) = seed
    locally {
      var i = 1
      while (i < N) {
        // mt[i] = 1812433253 * (mt[i-1] ^ (mt[i-1] >>> 30)) + i   (mod 2^32)
        mt(i) = 1812433253 * (mt(i - 1) ^ (mt(i - 1) >>> 30)) + i
        i += 1
      }
    }

    /** next uint32, returned in the low 32 bits of a Long. */
    def nextUInt(): Long = {
      if (mti >= N) {
        var k = 0
        while (k < N) {
          val y = (mt(k) & 0x80000000) | (mt((k + 1) % N) & 0x7fffffff)
          var next = mt((k + 397) % N) ^ (y >>> 1)
          if ((y & 1) != 0) next ^= 0x9908b0df
          mt(k) = next
          k += 1
        }
        mti = 0
      }
      var y = mt(mti)
      mti += 1
      y ^= (y >>> 11)
      y ^= (y << 7) & 0x9d2c5680
      y ^= (y << 15) & 0xefc60000
      y ^= (y >>> 18)
      y.toLong & 0xffffffffL
    }

    /** boost::uniform_real<float>(0,1): float(u32)/2^32, retry on 1.0f. */
    def nextFloat01(): Float = {
      var r = nextUInt().toFloat / 4294967296.0f
      while (r >= 1.0f) r = nextUInt().toFloat / 4294967296.0f
      r
    }
  }

  val DefaultClass = "@default_class"

  /** 64-bit polynomial token hash — reference helpers.cc:112-131. */
  def tokenHash(classId: String, token: String, seed: Int): Long = {
    var h = 1125899906842597L
    if (classId != DefaultClass) {
      var i = 0
      while (i < classId.length) { h = 31 * h + classId.charAt(i); i += 1 }
    }
    h = 31 * h + 255
    var i = 0
    while (i < token.length) { h = 31 * h + token.charAt(i); i += 1 }
    if (seed > 0) h = 31 * h + seed
    h
  }

  /** reference helpers.cc:79-110: draw `size` uniforms (with optional
    * guaranteed zeros) and L1-normalize, all in float32. */
  def generateRandomVector(size: Int, seed: Long, guaranteedZerosRate: Float = 0.0f): Array[Float] = {
    val rng = new Mt19937(seed.toInt) // size_t -> uint32 truncation, as in boost
    val out = new Array[Float](size)
    var i = 0
    if (guaranteedZerosRate > 1e-37f) {
      while (i < size) {
        out(i) = if (rng.nextFloat01() > guaranteedZerosRate) rng.nextFloat01() else 0.0f
        i += 1
      }
    } else {
      while (i < size) { out(i) = rng.nextFloat01(); i += 1 }
    }
    var sum = 0.0f
    i = 0
    while (i < size) { sum += out(i); i += 1 }
    if (sum > 0) {
      i = 0
      while (i < size) { out(i) /= sum; i += 1 }
    }
    out
  }

  def seededTokenVector(size: Int, classId: String, token: String, seed: Int,
      guaranteedZerosRate: Float = 0.0f): Array[Float] =
    generateRandomVector(size, tokenHash(classId, token, seed), guaranteedZerosRate)
}
