package graft.operators

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  test("fakeDecode is deterministic with a unit-sum feature histogram") {
    val bytes = "spark multimodal payload".getBytes("UTF-8")
    val d1 = Multimodal.fakeDecode(7L, bytes)
    val d2 = Multimodal.fakeDecode(7L, bytes)
    assert(d1 == d2.copy(features = d1.features) &&
      d1.features.sameElements(d2.features))
    assert(math.abs(d1.features.sum - 1.0f) < 1e-4)
    assert(d1.n_bytes == bytes.length.toLong && d1.channels == 3)
    assert(d1.width >= 16 && d1.width < 64 && d1.height >= 16 && d1.height < 64)
  }

  test("empty payload decodes without dividing by zero") {
    val d = Multimodal.fakeDecode(1L, Array.emptyByteArray)
    assert(d.n_bytes == 0L && d.features.forall(_ == 0f))
  }
}
