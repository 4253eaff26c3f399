package graft

import graft.operators.Multimodal

/** Deterministic fake codec, TEST-ONLY: exercises the [[Multimodal]]
  * batch-decode plumbing (schema, partitioning, frame slicing) without
  * requiring payloads to be real media. Features are byte-histogram
  * moments. Production paths use the real decoders
  * ([[Multimodal.ImageBandDecoder]], decodeImageMeta/decodePixelStats/
  * decodeImageFeatures) — this class exists so plumbing specs can run on
  * arbitrary byte payloads.
  */
final class StubDecoder(val featureDim: Int = 8) extends Multimodal.Decoder {
  def decode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    out
  }
}
