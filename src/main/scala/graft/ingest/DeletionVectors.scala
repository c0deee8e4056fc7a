package graft.ingest

import java.io.File
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files
import java.util.zip.CRC32

/** Delta Lake deletion-vector decoding, built from the PUBLIC protocol
  * documents only: the Delta transaction-log protocol
  * (https://github.com/delta-io/delta/blob/master/PROTOCOL.md, §
  * "Deletion Vectors") and the Roaring bitmap portable serialization
  * spec (https://github.com/RoaringBitmap/RoaringFormatSpec). No
  * delta or RoaringBitmap jars — the harness classpath has neither,
  * so both formats are implemented here from their specs.
  *
  * A deletion vector marks row POSITIONS of one data file as deleted;
  * an `add` action carrying one means "this parquet file, minus these
  * row indexes". The descriptor (in the `add` JSON / checkpoint
  * struct):
  *
  *  - `storageType`: `"u"` — the DV lives in a `.bin` file under the
  *    table root whose name derives from a Z85-encoded UUID;
  *    `"p"` — an absolute path to such a file; `"i"` — the DV bytes
  *    are INLINE in the descriptor, Z85-encoded.
  *  - `pathOrInlineDv`: for `"u"`, `<randomPrefix?><20-char Z85
  *    UUID>`; for `"p"`, the path; for `"i"`, the encoded bytes.
  *  - `offset`: byte position of this DV's length-prefixed block
  *    inside the file (absent for inline).
  *  - `sizeInBytes`: size of the serialized bitmap data.
  *  - `cardinality`: number of deleted rows (used here as the
  *    broadcast-vs-shuffle size guard, same as
  *    [[VersionedTableIO]]'s DV reads).
  *
  * On-disk `.bin` layout (protocol "Deletion Vector File Storage
  * Format"): one format-version byte (= 1), then per stored DV a
  * 4-byte BIG-endian data size, the data bytes, and a 4-byte
  * BIG-endian CRC-32 of the data. The data itself is a
  * RoaringBitmapArray in "portable" form: 4-byte LITTLE-endian magic
  * 1681511377, an 8-byte little-endian bitmap count, then that many
  * standard 32-bit Roaring bitmaps (portable spec), where bitmap i
  * holds the low 32 bits of the 64-bit positions whose high 32 bits
  * equal i.
  *
  * Z85 (https://rfc.zeromq.org/spec/32) maps 4 bytes → 5 chars;
  * inputs are zero-padded to a 4-byte multiple and the decoder
  * truncates back to the caller's known length — the same convention
  * delta-spark's Base85Codec documents. */
object DeletionVectors {

  // ---- Z85 ----------------------------------------------------------------

  private val Z85Alphabet =
    ("0123456789abcdefghijklmnopqrstuvwxyz" +
     "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#").toCharArray
  private val Z85Decode: Array[Int] = {
    val d = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => d(c.toInt) = i }
    d
  }

  /** Z85-encode, zero-padding to a 4-byte multiple. */
  def z85Encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var k = 4
      val block = new Array[Char](5)
      while (k >= 0) { block(k) = Z85Alphabet((v % 85).toInt); v /= 85; k -= 1 }
      sb.appendAll(block)
      i += 4
    }
    sb.toString
  }

  /** Z85-decode to exactly `outLen` bytes (padding stripped). */
  def z85Decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 input length ${s.length} not 5-aligned")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j).toInt
        val d = if (c < 128) Z85Decode(c) else -1
        require(d >= 0, s"invalid Z85 character '${s.charAt(i + j)}'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(i / 5 * 4 + k) = (v & 0xff).toByte; v >>= 8; k -= 1 }
      i += 5
    }
    require(outLen <= out.length,
      s"requested $outLen bytes from ${out.length} decoded")
    java.util.Arrays.copyOfRange(out, 0, outLen)
  }

  // ---- Roaring portable ---------------------------------------------------

  private val SerialCookie = 12346 // with run containers
  private val SerialCookieNoRun = 12347
  private val NoOffsetThreshold = 4
  private val BitmapArrayMagic = 1681511377

  /** Parse ONE standard 32-bit Roaring bitmap (portable spec) from
    * `buf` (positioned at its cookie), returning its values as
    * unsigned-32 sorted longs. Handles array, bitmap, and run
    * containers and both cookies. */
  def readRoaring32(buf: ByteBuffer): Array[Long] = {
    buf.order(ByteOrder.LITTLE_ENDIAN)
    val cookie = buf.getInt()
    val (nContainers, runFlags) =
      if ((cookie & 0xffff) == SerialCookie) {
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        buf.get(flags)
        (n, Some(flags))
      } else if (cookie == SerialCookieNoRun) {
        (buf.getInt(), None)
      } else {
        throw new IllegalArgumentException(
          s"not a portable Roaring bitmap: cookie $cookie")
      }
    def isRun(i: Int): Boolean =
      runFlags.exists(f => (f(i / 8) & (1 << (i % 8))) != 0)
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = buf.getShort() & 0xffff
      cards(i) = (buf.getShort() & 0xffff) + 1
      i += 1
    }
    // the offset header is redundant for a sequential parse — skip it
    if (runFlags.isEmpty || nContainers >= NoOffsetThreshold)
      buf.position(buf.position() + 4 * nContainers)
    val out = Array.newBuilder[Long]
    i = 0
    while (i < nContainers) {
      val hi = keys(i).toLong << 16
      if (isRun(i)) {
        val nRuns = buf.getShort() & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = buf.getShort() & 0xffff
          val len = buf.getShort() & 0xffff
          var v = start
          while (v <= start + len) { out += (hi | v); v += 1 }
          r += 1
        }
      } else if (cards(i) <= 4096) {
        var c = 0
        while (c < cards(i)) { out += (hi | (buf.getShort() & 0xffff)); c += 1 }
      } else {
        var w = 0
        while (w < 1024) {
          var word = buf.getLong()
          val base = hi | (w.toLong << 6)
          while (word != 0L) {
            out += (base | java.lang.Long.numberOfTrailingZeros(word))
            word &= word - 1
          }
          w += 1
        }
      }
      i += 1
    }
    out.result()
  }

  /** Serialize sorted unsigned-32 values as ONE portable Roaring
    * bitmap (no-run cookie; array or bitmap containers by
    * cardinality) — used by the writer side of specs and by any
    * future DV-emitting operation. */
  def writeRoaring32(values: Array[Long]): Array[Byte] = {
    val byKey = values.map { v =>
      require(v >= 0 && v <= 0xffffffffL, s"not a u32: $v")
      v
    }.groupBy(v => (v >>> 16).toInt).toSeq.sortBy(_._1)
    val n = byKey.size
    val bodyLens = byKey.map { case (_, vs) =>
      if (vs.length <= 4096) 2 * vs.length else 8192 }
    val size = 8 + 4 * n + 4 * n + bodyLens.sum
    val buf = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(SerialCookieNoRun)
    buf.putInt(n)
    byKey.foreach { case (k, vs) =>
      buf.putShort(k.toShort); buf.putShort((vs.length - 1).toShort)
    }
    var off = 8 + 4 * n + 4 * n
    bodyLens.foreach { len => buf.putInt(off); off += len }
    byKey.foreach { case (_, vs) =>
      if (vs.length <= 4096)
        vs.sorted.foreach(v => buf.putShort((v & 0xffff).toShort))
      else {
        val words = new Array[Long](1024)
        vs.foreach { v =>
          val low = (v & 0xffff).toInt
          words(low >>> 6) |= (1L << (low & 63))
        }
        words.foreach(buf.putLong)
      }
    }
    buf.array()
  }

  /** Serialize 64-bit positions as RoaringBitmapArray data (magic +
    * count + per-high-word bitmaps). */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val byHigh = positions.map { p =>
      require(p >= 0, s"negative row position $p"); p
    }.groupBy(_ >>> 32)
    val nBitmaps = byHigh.keySet.maxOption.map(_ + 1).getOrElse(0L)
    // one bitmap per high word 0..max — gaps serialize as EMPTY
    // bitmaps (the array is indexed positionally, not keyed)
    val parts = (0L until nBitmaps).map { i =>
      writeRoaring32(byHigh.getOrElse(i, Array.empty[Long])
        .map(_ & 0xffffffffL).sorted)
    }
    val buf = ByteBuffer.allocate(12 + parts.map(_.length).sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.putInt(BitmapArrayMagic)
    buf.putLong(nBitmaps)
    parts.foreach(buf.put)
    buf.array()
  }

  /** Parse RoaringBitmapArray data into sorted 64-bit positions. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == BitmapArrayMagic,
      s"bad RoaringBitmapArray magic $magic (want $BitmapArrayMagic)")
    val n = buf.getLong()
    (0L until n).flatMap { i =>
      readRoaring32(buf).map(v => (i << 32) | v)
    }.toArray
  }

  // ---- descriptor + file IO -----------------------------------------------

  /** A parsed `deletionVector` descriptor. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  /** Absolute `.bin` path a `"u"`/`"p"` descriptor points at. */
  def resolvePath(tableRoot: File, d: Descriptor): File = d.storageType match {
    case "p" => new File(d.pathOrInlineDv)
    case "u" =>
      val enc = d.pathOrInlineDv
      require(enc.length >= 20,
        s"storageType=u pathOrInlineDv too short: '$enc'")
      val prefix = enc.substring(0, enc.length - 20)
      val uuidBytes = z85Decode(enc.substring(enc.length - 20), 16)
      val bb = ByteBuffer.wrap(uuidBytes)
      val uuid = new java.util.UUID(bb.getLong(), bb.getLong())
      val dir = if (prefix.isEmpty) tableRoot else new File(tableRoot, prefix)
      new File(dir, s"deletion_vector_$uuid.bin")
    case t => throw new IllegalArgumentException(
      s"deletion-vector storageType '$t' is not path-backed")
  }

  /** Deleted row positions of one descriptor (reads + CRC-checks the
    * `.bin` block, or decodes the inline payload). */
  def positions(tableRoot: File, d: Descriptor): Array[Long] = {
    val data = d.storageType match {
      case "i" => z85Decode(d.pathOrInlineDv, d.sizeInBytes)
      case _ =>
        val f = resolvePath(tableRoot, d)
        require(f.isFile, s"deletion-vector file $f does not exist")
        val all = Files.readAllBytes(f.toPath)
        val off = d.offset.getOrElse(1) // after the format-version byte
        val bb = ByteBuffer.wrap(all).order(ByteOrder.BIG_ENDIAN)
        bb.position(off)
        val size = bb.getInt()
        require(size == d.sizeInBytes,
          s"DV size prefix $size != descriptor sizeInBytes ${d.sizeInBytes}")
        val body = new Array[Byte](size)
        bb.get(body)
        val storedCrc = bb.getInt()
        val crc = new CRC32(); crc.update(body)
        require(crc.getValue.toInt == storedCrc,
          s"DV checksum mismatch in $f at offset $off")
        body
    }
    val pos = deserialize(data)
    require(pos.length.toLong == d.cardinality,
      s"DV cardinality ${d.cardinality} != decoded ${pos.length}")
    pos
  }

  /** Write one DV into a fresh `.bin` file under `tableRoot` and
    * return the `"u"`-style descriptor — the writer half used by
    * specs (and available to future delete operations). */
  def writeFile(tableRoot: File, positionsArr: Array[Long]): Descriptor = {
    val data = serialize(positionsArr)
    val uuid = java.util.UUID.randomUUID()
    val bb = ByteBuffer.allocate(16)
    bb.putLong(uuid.getMostSignificantBits)
    bb.putLong(uuid.getLeastSignificantBits)
    val f = new File(tableRoot, s"deletion_vector_$uuid.bin")
    val crc = new CRC32(); crc.update(data)
    val out = ByteBuffer.allocate(1 + 4 + data.length + 4)
      .order(ByteOrder.BIG_ENDIAN)
    out.put(1.toByte) // format version
    out.putInt(data.length)
    out.put(data)
    out.putInt(crc.getValue.toInt)
    Files.write(f.toPath, out.array())
    Descriptor("u", z85Encode(bb.array()), Some(1), data.length,
      positionsArr.length.toLong)
  }
}
