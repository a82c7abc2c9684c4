package graft.functions

/** Independent geohash reference: the classic per-bit bisection
  * algorithm — shared by GeohashSpec and KeyKernelPropertySpec so the
  * two suites validate against ONE implementation.
  */
object GeohashReference {
  def encode(lon: Double, lat: Double, precision: Int): String = {
    var (lonLo, lonHi, latLo, latHi) = (-180.0, 180.0, -90.0, 90.0)
    var even = true
    val sb = new StringBuilder
    var bit = 0
    var idx = 0
    while (sb.length < precision) {
      if (even) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { idx = idx * 2 + 1; lonLo = mid } else { idx = idx * 2; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { idx = idx * 2 + 1; latLo = mid } else { idx = idx * 2; latHi = mid }
      }
      even = !even
      bit += 1
      if (bit == 5) { sb.append(Geohash.Alphabet(idx)); bit = 0; idx = 0 }
    }
    sb.toString
  }
}
