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
  * blocks — a shard ending cleanly at the last member's padded end (no
  * trailer) is also accepted as complete. Long member names — the norm
  * in URL-keyed WebDataset shards — resolve through both public
  * mechanisms: GNU `L` longname members and PAX `x` extended headers
  * (`path=`/`size=` records per POSIX.1-2001 pax(1), `%d key=value\n`
  * with the length counting itself); PAX `g` global headers and GNU `K`
  * longlink targets are skipped (we index regular files, not links).
  * Structural damage (bad octal, size past the end, missing magic,
  * malformed pax records) → one `ok = false` row.
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
      // GNU 'L' / PAX 'x' overrides apply to the NEXT member, then reset
      var pendingName: String = null
      var pendingSize = -1L
      // uniform damage handling: keep the members that DID frame and
      // append one ok=false marker, wherever the damage lands — a sample
      // grouper sees partial shards as quarantined, never silently short
      def quarantine(): Unit = { damaged = true; done = true }
      def allZero(off: Int): Boolean = {
        var i = 0
        while (i < 512) { if (p(off + i) != 0) return false; i += 1 }
        true
      }
      def trimNul(s: String): String = {
        val z = s.indexOf('\u0000'); if (z < 0) s else s.substring(0, z)
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
            sizeStr.isEmpty || !sizeStr.forall(c => c >= '0' && c <= '7')) quarantine()
          else {
            def str(off: Int, len: Int): String = {
              var e = 0
              while (e < len && p(pos + off + e) != 0) e += 1
              new String(p, pos + off, e, "UTF-8")
            }
            val size = java.lang.Long.parseLong(sizeStr, 8)
            val dataStart = pos + 512
            if (size < 0 || dataStart + size > p.length) quarantine()
            else tf match {
              case 'L' => // GNU longname: payload = next member's name
                pendingName = trimNul(new String(p, dataStart, size.toInt, "UTF-8"))
                pos = dataStart + (((size + 511) / 512) * 512).toInt
              case 'K' => // GNU longlink target — links aren't indexed
                pos = dataStart + (((size + 511) / 512) * 512).toInt
              case 'x' => // PAX extended header for the next member
                parsePax(p, dataStart, size.toInt) match {
                  case Some(recs) =>
                    recs.get("path").foreach(pendingName = _)
                    recs.get("size").foreach { v =>
                      try pendingSize = java.lang.Long.parseLong(v)
                      catch { case _: NumberFormatException => quarantine() }
                    }
                    if (!done) pos = dataStart + (((size + 511) / 512) * 512).toInt
                  case None => quarantine()
                }
              case 'g' => // PAX global defaults — skipped, not applied
                if (parsePax(p, dataStart, size.toInt).isEmpty) quarantine()
                else pos = dataStart + (((size + 511) / 512) * 512).toInt
              case other =>
                val name =
                  if (pendingName != null) pendingName
                  else {
                    val name0 = str(0, 100)
                    val prefix = str(345, 155)
                    if (prefix.isEmpty) name0 else prefix + "/" + name0
                  }
                // PAX size= overrides the octal field (it can't hold
                // >8 GiB); data advancement must use the real length
                val effSize = if (pendingSize >= 0) pendingSize else size
                pendingName = null
                pendingSize = -1L
                if (effSize < 0 || dataStart + effSize > p.length) quarantine()
                else {
                  if (other == '0' || other == 0.toChar) { // regular file
                    out += TarMember(id, idx, name, effSize, dataStart.toLong, ok = true)
                    idx += 1
                  } // directories ('5') etc. indexed past silently
                  pos = dataStart + (((effSize + 511) / 512) * 512).toInt
                }
            }
          }
        }
      }
      // a shard ending exactly at the last member's padded end (no zero
      // trailer) is complete — only a MID-member end is truncation. A
      // dangling longname/PAX header is truncation however the shard
      // ended (trailer or clean payload end): the member it names is
      // missing and must not vanish silently
      if (pendingName != null || pendingSize >= 0) damaged = true
      if ((!done && pos != p.length) || damaged)
        out += TarMember(id, idx, "", 0L, 0L, ok = false)
      val res = out.result()
      if (res.isEmpty) bad else res.iterator
    } catch { case scala.util.control.NonFatal(_) => bad }
  }

  /** PAX extended-header records (`%d key=value\n`, the decimal length
    * counting itself, the space, and the trailing newline — POSIX.1-2001
    * pax(1) `-x pax` format). `None` on any malformed record. */
  private[graft] def parsePax(p: Array[Byte], off: Int, len: Int): Option[Map[String, String]] = {
    val m = Map.newBuilder[String, String]
    var i = 0
    while (i < len) {
      var j = i
      while (j < len && p(off + j) != ' ') j += 1
      if (j >= len || j == i) return None
      val recLen =
        try new String(p, off + i, j - i, "US-ASCII").toInt
        catch { case _: NumberFormatException => return None }
      if (recLen <= 0 || i + recLen > len || p(off + i + recLen - 1) != '\n') return None
      val body = new String(p, off + j + 1, recLen - (j - i) - 2, "UTF-8")
      val eq = body.indexOf('=')
      if (eq < 0) return None
      m += body.substring(0, eq) -> body.substring(eq + 1)
      i += recLen
    }
    Some(m.result())
  }

  final case class WdSample(media_id: Long, key: String, n_parts: Long,
                            parts: String, sample_bytes: Long, ok: Boolean)

  final case class TarMemberPayload(media_id: Long, name: String,
                                    payload: Array[Byte], ok: Boolean)

  /** Member EXTRACTION — the shard→sample boundary of a WebDataset
    * pipeline: one row per regular member with its name and payload bytes
    * sliced out of the shard, ready to feed the image/audio decoders.
    * A structurally damaged shard emits one `ok = false` row (quarantine
    * propagates; the good prefix before the damage is still extracted,
    * matching [[parse]]'s contract). Unlike [[members]] this row CARRIES
    * the payload — callers must drop it before any shuffle (the decoders
    * do: hash/decode outputs are payload-free). Runs per shard inside one
    * map task; the shard bytes themselves never cross a shuffle. */
  def memberPayloads(media: Dataset[Multimodal.MediaRow]): Dataset[TarMemberPayload] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      parse(r.media_id, p).map { m =>
        if (!m.ok || m.offset + m.size > p.length)
          TarMemberPayload(r.media_id, m.name, Array.empty[Byte], ok = false)
        else TarMemberPayload(r.media_id, m.name,
          java.util.Arrays.copyOfRange(p, m.offset.toInt, (m.offset + m.size).toInt),
          ok = true)
      }
    })
  }

  /** WebDataset view: members grouped into samples by the name up to the
    * first dot of the BASENAME with the directory prefix KEPT — the
    * webdataset library's `base_plus_ext` convention (key = optional
    * directory prefix plus the dot-free basename head): train/0001.jpg
    * and val/0001.jpg are DIFFERENT samples; stripping the directory
    * would silently fuse basename collisions across subdirectories.
    * Parts listed as the
    * sorted comma-joined extension set. Runs per shard payload inside the
    * same map task — no shuffle; a corrupt shard yields one ok=false
    * sample row. */
  def webdatasetSamples(media: Dataset[Multimodal.MediaRow]): Dataset[WdSample] = {
    import media.sparkSession.implicits._
    // first dot AFTER the last slash — a dotted directory name
    // (v1.2/x.jpg) must not split the key early
    def dotAt(name: String): Int = name.indexOf('.', name.lastIndexOf('/') + 1)
    media.mapPartitions(_.flatMap { r =>
      val p = if (r.payload == null) Array.empty[Byte] else r.payload
      val ms = parse(r.media_id, p).toVector
      if (ms.exists(!_.ok)) Iterator.single(
        WdSample(r.media_id, "", 0L, "", 0L, ok = false))
      else ms.groupBy { m =>
        val dot = dotAt(m.name)
        if (dot < 0) m.name else m.name.substring(0, dot)
      }.iterator.map { case (key, parts) =>
        val exts = parts.map { m =>
          val dot = dotAt(m.name)
          if (dot < 0) "" else m.name.substring(dot + 1)
        }.sorted.mkString(",")
        WdSample(r.media_id, key, parts.length.toLong, exts,
          parts.map(_.size).sum, ok = true)
      }
    })
  }

  // --------------------------------------------------------- fixture side

  /** ustar bytes for `entries` (name → data), standard header fields and
    * checksum, two trailing zero blocks. Names longer than 99 bytes emit
    * the long-name mechanism chosen by `longStyle`: a PAX `x` extended
    * header with a `path=` record (`"pax"`, what GNU tar
    * `--format=posix` writes) or a GNU `L` longname member (`"gnu"`);
    * the following ustar header carries the truncated name, exactly as
    * real archivers do. */
  def tarBytes(entries: Seq[(String, Array[Byte])],
               longStyle: String = "pax"): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def header(name: String, size: Int, typeflag: Char): Array[Byte] = {
      val h = new Array[Byte](512)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("UTF-8")
        System.arraycopy(b, 0, h, off, math.min(b.length, 99))
      }
      put(0, name)
      put(100, "0000644"); put(108, "0000000"); put(116, "0000000")
      put(124, f"$size%011o")
      put(136, "00000000000")
      h(156) = typeflag.toByte
      put(257, "ustar"); h(263) = '0'; h(264) = '0' // version "00"
      java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum as spaces
      var sum = 0
      for (b <- h) sum += b & 0xff
      put(148, f"$sum%06o"); h(154) = 0; h(155) = ' '
      h
    }
    def writeMember(name: String, data: Array[Byte], typeflag: Char): Unit = {
      bos.write(header(name, data.length, typeflag))
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    for ((name, data) <- entries) {
      if (name.getBytes("UTF-8").length > 99) {
        if (longStyle == "gnu")
          writeMember("././@LongLink", (name + "\u0000").getBytes("UTF-8"), 'L')
        else {
          val body = {
            val kv = s" path=$name\n"
            // record length counts its own decimal digits (fixed point),
            // in OCTETS — kv may contain multi-byte UTF-8
            val kvBytes = kv.getBytes("UTF-8").length
            var len = kvBytes + 1
            while ((len.toString.length + kvBytes) != len)
              len = len.toString.length + kvBytes
            s"$len$kv"
          }
          writeMember("./PaxHeaders.0/" + name.take(60), body.getBytes("UTF-8"), 'x')
        }
      }
      writeMember(name.take(99), data, '0')
    }
    bos.write(new Array[Byte](1024)) // end-of-archive
    bos.toByteArray
  }
}
