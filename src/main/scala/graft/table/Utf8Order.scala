package graft.table

/** String comparison in UTF-8 BINARY (= Unicode code-point) order — the order Spark's min/max
  * string aggregates use (UTF8String compares raw UTF-8 bytes). Java's `String.compareTo` is
  * UTF-16 code-unit order, which diverges for supplementary-plane code points (surrogate pairs,
  * 0xD800–0xDFFF units) vs U+E000–U+FFFF: a driver-side prune mixing the two orders can prove a
  * key "outside" a file's [minDocId, maxDocId] that actually contains it — a missed COW rewrite
  * (duplicate keys after MERGE) or a silently-missed point lookup.
  *
  * The comparator is allocation-free: chars compare directly except when both sides sit at or
  * above the surrogate block, where the classic remap (surrogates + 0x2000, U+E000.. − 0x800)
  * restores code-point order. Every driver-side comparison against manifest stats (merge range
  * prune, point lookup, delete-pressure slicing, diff carried-file prune) must use THIS order.
  */
object Utf8Order extends Ordering[String] {

  def compare(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      var ca = a.charAt(i).toInt
      var cb = b.charAt(i).toInt
      if (ca != cb) {
        if (ca >= 0xD800 && cb >= 0xD800) {
          // remap so UTF-16 unit order matches UTF-8 byte order: surrogate units (start of a
          // >U+FFFF code point) must sort ABOVE every BMP char including U+E000–U+FFFF
          ca = if (ca >= 0xE000) ca - 0x800 else ca + 0x2000
          cb = if (cb >= 0xE000) cb - 0x800 else cb + 0x2000
        }
        return ca - cb
      }
      i += 1
    }
    a.length - b.length
  }
}
