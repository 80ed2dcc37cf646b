package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfLongMap

/** The open-addressing primitive map behind the broadcast as-of
  * probe's integral-key fast path. The exec-level behavior is pinned
  * by AsOfJoinSpec (every semantic case runs on the broadcast path);
  * this spec pins the map itself in isolation against a
  * java.util.HashMap reference over the key shapes the mixer and the
  * linear probe must survive: dense consecutive ids, negative keys,
  * power-of-two-stride clusters (worst case for a masked hash), and
  * absent-key probes landing mid-chain.
  */
class AsOfLongMapSpec extends AnyFunSuite {

  private def reference(keys: Seq[Long]): (AsOfLongMap, java.util.HashMap[Long, Int]) = {
    val m = new AsOfLongMap(keys.size)
    val ref = new java.util.HashMap[Long, Int]()
    keys.zipWithIndex.foreach { case (k, i) => m.put(k, i); ref.put(k, i) }
    (m, ref)
  }

  test("dense consecutive ids: every key found, every neighbor miss is a miss") {
    val keys = (0L until 10000L).map(_ * 2) // evens present, odds absent
    val (m, ref) = reference(keys)
    keys.foreach(k => assert(m.get(k) === ref.get(k)))
    keys.foreach(k => assert(m.get(k + 1) === -1))
  }

  test("negative keys and Long extremes round-trip") {
    val keys = Seq(Long.MinValue, Long.MinValue + 1, -1000000007L, -3L,
      -2L, -1L, 0L, 1L, Long.MaxValue - 1, Long.MaxValue)
    val (m, ref) = reference(keys)
    keys.foreach(k => assert(m.get(k) === ref.get(k)))
    assert(m.get(42L) === -1)
    assert(m.get(-42L) === -1)
  }

  test("power-of-two strides (masked-hash worst case) keep chains correct") {
    // stride = table-capacity-sized power of two: without avalanche
    // these all land on few slots and the linear probe must resolve
    val keys = (0 until 4096).map(i => i.toLong << 16)
    val (m, ref) = reference(keys)
    keys.foreach(k => assert(m.get(k) === ref.get(k)))
    // absent keys one off each cluster: must terminate at an empty slot
    keys.take(512).foreach(k => assert(m.get(k + 7) === -1))
  }

  test("last put wins on duplicate key (build-side contract)") {
    val m = new AsOfLongMap(4)
    m.put(5L, 0)
    m.put(5L, 3)
    assert(m.get(5L) === 3)
  }

  test("oversized key count fails loudly instead of collapsing capacity") {
    // for n past ~2^29 the old int capacity math overflowed,
    // highestOneBit(negative) << 1 yielded 0, cap collapsed to the
    // 8-slot floor, and put() span forever on the 9th key — the Long
    // form must instead reject construction before allocating
    val e = intercept[IllegalArgumentException](new AsOfLongMap(600000000))
    assert(e.getMessage.contains("too large to broadcast"))
    intercept[IllegalArgumentException](new AsOfLongMap(Int.MaxValue))
  }

  test("pseudo-random fuzz vs HashMap reference") {
    // fixed-seed xorshift so the case is deterministic
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = { s ^= s << 13; s ^= s >>> 7; s ^= s << 17; s }
    val keys = Seq.fill(20000)(next()).distinct
    val (m, ref) = reference(keys)
    keys.foreach(k => assert(m.get(k) === ref.get(k)))
    (0 until 20000).foreach { _ =>
      val probe = next()
      val expect = if (ref.containsKey(probe)) ref.get(probe) else -1
      assert(m.get(probe) === expect)
    }
  }
}
