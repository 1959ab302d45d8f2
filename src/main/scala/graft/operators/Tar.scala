package graft.operators

import org.apache.spark.sql.Dataset

/** POSIX ustar (tar) member indexing and WebDataset sample grouping — the
  * shard container multimodal training corpora actually ship in
  * (WebDataset: a tar whose members `key.jpg` / `key.json` / `key.txt`
  * form one sample per key, consumed sequentially at full disk speed).
  *
  * From the public ustar layout: 512-byte headers (name 100, size as
  * octal at offset 124, typeflag 156, "ustar" magic 257, prefix 345),
  * member data rounded up to 512-byte blocks, end marked by two zero
  * blocks (or payload end). Regular files only; GNU longname/longlink
  * and PAX extension members quarantine the payload rather than
  * mis-keying samples. Structural damage (bad octal, size past the end,
  * missing magic) → one `ok = false` row.
  *
  * Scale shape: narrow mapPartitions; the tar payload never reaches a
  * shuffle — member rows carry name/size/offset only.
  */
object Tar {

  final case class TarMember(media_id: Long, member_idx: Int, name: String,
                             size: Long, offset: Long, ok: Boolean)

  def members(media: Dataset[Multimodal.MediaRow]): Dataset[TarMember] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      parse(r.media_id, p)
    })
  }

  private[graft] def parse(id: Long, p: Array[Byte]): Iterator[TarMember] = {
    def bad = Iterator.single(TarMember(id, 0, "", 0L, 0L, ok = false))
    try {
      val out = Vector.newBuilder[TarMember]
      var pos = 0
      var idx = 0
      var done = false
      var damaged = false
      // uniform damage handling: keep the members that DID frame and
      // append one ok=false marker, wherever the damage lands — a sample
      // grouper sees partial shards as quarantined, never silently short
      def quarantine(): Unit = { damaged = true; done = true }
      def allZero(off: Int): Boolean = {
        var i = 0
        while (i < 512) { if (p(off + i) != 0) return false; i += 1 }
        true
      }
      while (!done && pos + 512 <= p.length) {
        if (p(pos) == 0) {
          // end-of-archive per spec is a FULL zero block (two of them);
          // a header whose first name byte is zero but whose block is
          // otherwise nonzero is bit rot, not a clean end
          if (allZero(pos)) done = true else quarantine()
        } else {
          val magic = new String(p, pos + 257, 5, "US-ASCII")
          val sizeStr = {
            var e = 0
            while (e < 12 && p(pos + 124 + e) != 0) e += 1
            new String(p, pos + 124, e, "US-ASCII").trim
          }
          val tf = p(pos + 156).toChar
          if (magic != "ustar" ||
            sizeStr.isEmpty || !sizeStr.forall(c => c >= '0' && c <= '7') ||
            tf == 'L' || tf == 'K' || tf == 'x' || tf == 'g') quarantine()
          else {
            def str(off: Int, len: Int): String = {
              var e = 0
              while (e < len && p(pos + off + e) != 0) e += 1
              new String(p, pos + off, e, "UTF-8")
            }
            val name0 = str(0, 100)
            val prefix = str(345, 155)
            val name = if (prefix.isEmpty) name0 else prefix + "/" + name0
            val size = java.lang.Long.parseLong(sizeStr, 8)
            val dataStart = pos + 512
            if (size < 0 || dataStart + size > p.length) quarantine()
            else {
              if (tf == '0' || tf == 0.toChar) { // regular file
                out += TarMember(id, idx, name, size, dataStart.toLong, ok = true)
                idx += 1
              } // directories ('5') etc. indexed past silently
              pos = dataStart + (((size + 511) / 512) * 512).toInt
            }
          }
        }
      }
      // no end-of-archive zero block seen: truncated mid-shard
      if (!done || damaged) out += TarMember(id, idx, "", 0L, 0L, ok = false)
      val res = out.result()
      if (res.isEmpty) bad else res.iterator
    } catch { case scala.util.control.NonFatal(_) => bad }
  }

  final case class WdSample(media_id: Long, key: String, n_parts: Long,
                            parts: String, sample_bytes: Long, ok: Boolean)

  /** WebDataset view: members grouped into samples by the name before the
    * FIRST dot (the WebDataset key convention), parts listed as the
    * sorted comma-joined extension set. Runs per shard payload inside the
    * same map task — no shuffle; a corrupt shard yields one ok=false
    * sample row. */
  def webdatasetSamples(media: Dataset[Multimodal.MediaRow]): Dataset[WdSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      val ms = parse(r.media_id, p).toVector
      if (ms.exists(!_.ok)) Iterator.single(
        WdSample(r.media_id, "", 0L, "", 0L, ok = false))
      else ms.groupBy { m =>
        val base = m.name.substring(m.name.lastIndexOf('/') + 1)
        val dot = base.indexOf('.')
        if (dot < 0) base else base.substring(0, dot)
      }.iterator.map { case (key, parts) =>
        val exts = parts.map { m =>
          val base = m.name.substring(m.name.lastIndexOf('/') + 1)
          val dot = base.indexOf('.')
          if (dot < 0) "" else base.substring(dot + 1)
        }.sorted.mkString(",")
        WdSample(r.media_id, key, parts.length.toLong, exts,
          parts.map(_.size).sum, ok = true)
      }
    })
  }

  // --------------------------------------------------------- fixture side

  /** ustar bytes for `entries` (name → data), standard header fields and
    * checksum, two trailing zero blocks. */
  def tarBytes(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    for ((name, data) <- entries) {
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("UTF-8")
        System.arraycopy(b, 0, h, off, math.min(b.length, 99))
      }
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"${data.length}%011o")
      put(136, "00000000000")
      h(156) = '0'
      put(257, "ustar"); h(263) = '0'; h(264) = '0' // version "00"
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum as spaces
      var sum = 0
      for (b <- h) sum += b & 0xff
      put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
      bos.write(h)
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024)) // end-of-archive
    bos.toByteArray
  }
}
