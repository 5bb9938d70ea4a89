package graft.ops

/** Minimal ISO BMFF (MP4) container writer + demuxer — container-LEVEL
  * video support for the multimodal tier: box walking, sample-table
  * (stbl) parsing, and frame extraction at stco/stsc/stsz-derived byte
  * offsets. No pixel decode — the JDK ships no video codec, so that
  * layer stays honestly out of scope — but everything a 100 TB demux
  * stage must do BEFORE a codec (locate every frame inside an opaque
  * blob without decoding it) is real and loud-failing.
  *
  * Box layout follows the public ISO/IEC 14496-12 structure
  * (size32 + fourcc + payload; full boxes prefix version/flags). The
  * writer emits ftyp + mdat + moov with a complete video sample table
  * (mvhd/tkhd/mdhd/hdlr/vmhd/dinf/stsd/stts/stsc/stsz/stco), frames
  * grouped into MULTI-SAMPLE CHUNKS so the demuxer's stsc run expansion
  * is exercised, not just the one-chunk degenerate case. The reference
  * engine has no video path at all (SURVEY §2) — this tier is
  * north-star surface.
  */
object Mp4 {

  /** Parsed track: media timescale, total ticks, per-sample byte sizes
    * and absolute payload offsets.
    */
  case class Track(timescale: Long, durationTicks: Long,
                   sampleSizes: Array[Long], sampleOffsets: Array[Long])

  /** Media timescale (ticks/second) and per-frame tick delta the writer
    * stamps; 90 kHz is the conventional video clock.
    */
  val MediaTimescale = 90000L
  val FrameDelta = 3000L

  /** Samples per chunk the writer groups frames into (last chunk may be
    * smaller → a second stsc run).
    */
  val SamplesPerChunk = 3

  // ---- synthetic container (closed-form, oracle-checkable) ----

  /** Deterministic frames for an id: n = 4 + id mod 8 frames; frame i
    * has 32 + (id·7 + i·13) mod 64 bytes; byte j of frame i is
    * (id·7919 + i·131 + j·31) mod 256. Every aggregate over the
    * EXTRACTED frames is therefore a closed-form integer function of the
    * id — the oracle handle (same pattern as the PNG/WAV tiers).
    */
  def synthFrames(docId: Long): IndexedSeq[Array[Byte]] = {
    val n = 4 + (docId % 8).toInt
    (0 until n).map { i =>
      val sz = 32 + ((docId * 7 + i * 13L) % 64).toInt
      Array.tabulate[Byte](sz)(j =>
        ((docId * 7919 + i * 131L + j * 31L) % 256).toByte)
    }
  }

  private def be32(vs: Long*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  private def be16(vs: Int*): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 * vs.length)
    vs.foreach(v => bb.putShort(v.toShort))
    bb.array()
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    val bb = java.nio.ByteBuffer.allocate(n)
    bb.putInt(n)
    bb.put(ascii(typ))
    payload.foreach(bb.put)
    bb.array()
  }

  private def fullBox(typ: String, version: Int, flags: Int,
                      payload: Array[Byte]*): Array[Byte] =
    box(typ, (be32((version.toLong << 24) | flags) +: payload): _*)

  private val IdentityMatrix =
    be32(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)

  /** A real (if austere) MP4: ftyp + mdat(frames) + moov with a full
    * sample table. Frames are grouped [[SamplesPerChunk]] per chunk.
    */
  def syntheticMp4(docId: Long): Array[Byte] =
    containerize(synthFrames(docId))

  /** Containerize caller-provided frame payloads (the writer half of the
    * demux contract, independent of the synthetic byte pattern) — e.g.
    * real JPEG frames for the MJPEG decode tier.
    */
  def containerize(frames: IndexedSeq[Array[Byte]]): Array[Byte] = {
    val n = frames.length
    val sizes = frames.map(_.length.toLong)
    val ftyp = box("ftyp", ascii("isom"), be32(0x200), ascii("isommp42"))
    val mdat = box("mdat", frames: _*)
    val mdatPayload = ftyp.length + 8L

    // chunks: SamplesPerChunk frames each, remainder in a smaller tail
    val chunkCounts = Seq.range(0, n, SamplesPerChunk)
      .map(s => math.min(SamplesPerChunk, n - s))
    // chunk start offsets: running sum of each chunk's sample bytes
    val offs = {
      var off = mdatPayload
      var s = 0
      chunkCounts.map { cnt =>
        val o = off
        off += sizes.slice(s, s + cnt).sum
        s += cnt
        o
      }
    }

    val durTicks = n * FrameDelta
    val mvhdDur = durTicks * 1000 / MediaTimescale // movie timescale 1000
    val mvhd = fullBox("mvhd", 0, 0,
      be32(0, 0, 1000, mvhdDur, 0x00010000L), be16(0x0100, 0),
      be32(0, 0), IdentityMatrix, be32(0, 0, 0, 0, 0, 0), be32(2))
    val tkhd = fullBox("tkhd", 0, 7,
      be32(0, 0, 1, 0, mvhdDur, 0, 0), be16(0, 0, 0, 0),
      IdentityMatrix, be32(64L << 16, 64L << 16))
    val mdhd = fullBox("mdhd", 0, 0,
      be32(0, 0, MediaTimescale, durTicks), be16(0x55c4, 0))
    val hdlr = fullBox("hdlr", 0, 0,
      be32(0), ascii("vide"), be32(0, 0, 0), ascii("graft") ++ Array[Byte](0))
    val vmhd = fullBox("vmhd", 0, 1, be16(0, 0, 0, 0))
    val dref = fullBox("dref", 0, 0, be32(1), fullBox("url ", 0, 1))
    val dinf = box("dinf", dref)
    // VisualSampleEntry 'mp4v' (78-byte body; no codec config — demux
    // stops at the container level by design)
    val sampleEntry = box("mp4v",
      new Array[Byte](6), be16(1),
      be32(0, 0, 0, 0), be16(64, 64), be32(0x00480000L, 0x00480000L, 0),
      be16(1), new Array[Byte](32), be16(0x0018, 0xffff))
    val stsd = fullBox("stsd", 0, 0, be32(1), sampleEntry)
    val stts = fullBox("stts", 0, 0, be32(1, n, FrameDelta))
    val stscRuns =
      if (chunkCounts.distinct.length == 1) Seq((1L, chunkCounts.head.toLong))
      else Seq((1L, SamplesPerChunk.toLong),
        (chunkCounts.length.toLong, chunkCounts.last.toLong))
    val stsc = fullBox("stsc", 0, 0,
      be32(stscRuns.length.toLong +:
        stscRuns.flatMap { case (fc, spc) => Seq(fc, spc, 1L) }: _*))
    val stsz = fullBox("stsz", 0, 0, be32(0L +: n.toLong +: sizes: _*))
    val stco = fullBox("stco", 0, 0,
      be32(offs.length.toLong +: offs: _*))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  // ---- demuxer ----

  /** Children boxes of buf[start, end): (fourcc, payloadStart, boxEnd).
    * Fails loudly on truncated or corrupt sizes (a silent skip would
    * turn blob corruption into wrong frame aggregates downstream).
    */
  private def children(buf: Array[Byte], start: Int,
                       end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = start
    while (p < end) {
      require(end - p >= 8, s"truncated box header at offset $p")
      val size = java.nio.ByteBuffer.wrap(buf, p, 4).getInt
      require(size != 0 && size != 1,
        s"largesize/to-end box at offset $p unsupported")
      require(size >= 8 && p + size <= end,
        s"corrupt box size $size at offset $p")
      out += ((new String(buf, p + 4, 4, "US-ASCII"), p + 8, p + size))
      p += size
    }
    out.result()
  }

  private def into(buf: Array[Byte], start: Int, end: Int,
                   path: String*): (Int, Int) =
    path.foldLeft((start, end)) { case ((a, b), t) =>
      val c = children(buf, a, b).find(_._1 == t)
        .getOrElse(sys.error(s"missing $t box"))
      (c._2, c._3)
    }

  /** Full-box payload reader positioned after version/flags; version
    * must be 0 (the writer's; v1 64-bit tables fail loudly).
    */
  private def fullPayload(buf: Array[Byte], se: (Int, Int),
                          typ: String): java.nio.ByteBuffer = {
    val bb = java.nio.ByteBuffer.wrap(buf, se._1, se._2 - se._1)
    val vf = bb.getInt
    require(vf >>> 24 == 0, s"$typ version ${vf >>> 24} unsupported")
    bb
  }

  private def u32(bb: java.nio.ByteBuffer): Long = bb.getInt.toLong & 0xffffffffL

  /** Parse the first video track's sample table and resolve every
    * sample's absolute byte offset (stsc run expansion over stco chunk
    * starts, sizes from stsz), cross-checking stts total ticks against
    * the mdhd duration and every sample extent against the mdat bounds.
    */
  def demux(payload: Array[Byte]): Track = {
    val top = children(payload, 0, payload.length)
    require(top.exists(_._1 == "ftyp"), "missing ftyp box")
    val (md0, md1) = top.find(_._1 == "mdat").map(c => (c._2, c._3))
      .getOrElse(sys.error("missing mdat box"))
    val (ms, me) = top.find(_._1 == "moov").map(c => (c._2, c._3))
      .getOrElse(sys.error("missing moov box"))

    val mdhd = fullPayload(payload, into(payload, ms, me,
      "trak", "mdia", "mdhd"), "mdhd")
    mdhd.getInt; mdhd.getInt // creation, modification
    val timescale = u32(mdhd)
    val duration = u32(mdhd)

    val (st0, st1) = into(payload, ms, me, "trak", "mdia", "minf", "stbl")
    val stbl = children(payload, st0, st1)
      .map(c => c._1 -> ((c._2, c._3))).toMap
    def table(t: String): java.nio.ByteBuffer =
      fullPayload(payload, stbl.getOrElse(t, sys.error(s"missing $t box")), t)

    val szb = table("stsz")
    val fixedSize = u32(szb)
    val nSamples = u32(szb).toInt
    val sizes =
      if (fixedSize != 0) Array.fill(nSamples)(fixedSize)
      else Array.fill(nSamples)(u32(szb))

    val cob = table("stco")
    val chunkOffs = Array.fill(u32(cob).toInt)(u32(cob))

    val scb = table("stsc")
    val runs = Array.fill(u32(scb).toInt)((u32(scb), u32(scb), u32(scb)))
    require(runs.nonEmpty, "empty stsc")

    val offsets = new Array[Long](nSamples)
    var r = 0
    var s = 0
    var c = 1L
    while (c <= chunkOffs.length && s < nSamples) {
      while (r + 1 < runs.length && runs(r + 1)._1 <= c) r += 1
      var off = chunkOffs(c.toInt - 1)
      var k = 0L
      while (k < runs(r)._2 && s < nSamples) {
        offsets(s) = off
        off += sizes(s)
        s += 1
        k += 1
      }
      c += 1
    }
    require(s == nSamples, s"stsc/stco cover only $s of $nSamples samples")

    val ttb = table("stts")
    var ticks = 0L
    for (_ <- 0 until u32(ttb).toInt) ticks += u32(ttb) * u32(ttb)
    require(ticks == duration,
      s"stts total $ticks != mdhd duration $duration")

    for (i <- 0 until nSamples)
      require(offsets(i) >= md0 && offsets(i) + sizes(i) <= md1,
        s"sample $i [${offsets(i)}, +${sizes(i)}) outside mdat [$md0, $md1)")
    Track(timescale, duration, sizes, offsets)
  }

  /** Extract every frame's bytes at its demuxed offset. */
  def frames(a: Asset): Iterator[Frame] = {
    val t = demux(a.payload)
    t.sampleSizes.indices.iterator.map { i =>
      Frame(a.asset_id, i, java.util.Arrays.copyOfRange(a.payload,
        t.sampleOffsets(i).toInt, (t.sampleOffsets(i) + t.sampleSizes(i)).toInt))
    }
  }
}
