package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM HDF5 subset reader (SURVEY §2.1 S19) — the *container* of
  * ODIM_H5 radar polar volumes, which the reference opens through
  * h5py/wradlib (radar/precipitacao/src/data/process/process_ppi.py:73-143)
  * before the numpy compute that [[RadarPpi]] re-expresses.
  *
  * Scope — the classic on-disk layout every ODIM writer (libhdf5 ≤1.8
  * defaults, h5py default file format) produces:
  *   - superblock version 0, undefined addresses = all-ones
  *   - version-1 object headers (+ continuation blocks)
  *   - old-style groups: symbol-table message → v1 B-tree → SNOD nodes
  *     → local heap names
  *   - dataspace messages v1/v2, datatype classes fixed-point / float /
  *     string (little- or big-endian)
  *   - data layout v3, contiguous or chunked; chunk v1 B-tree; filter
  *     pipeline with deflate (gzip) and the no-op shuffle=off case
  *   - attribute messages v1/v2/v3, scalar and 1-D
  * Anything outside (superblock v2+ "latest" format, fractal-heap
  * groups, v2 B-trees, szip) throws with a message naming the gap —
  * fail loudly, never guess.
  *
  * Like [[NetCdf]], this is executor-local byte parsing over one file's
  * content; the distributed fan-out (binary file rows → ray rows) lives
  * in [[OdimH5.rays]].
  */
object Hdf5 {

  private val Undef = -1L // 0xFFFF... as signed

  /** Parsed datatype: class 0 fixed-point, 1 float, 3 string. */
  final case class Dtype(clazz: Int, size: Int, littleEndian: Boolean,
                         signed: Boolean)

  /** Attribute value: strings collapse to text, numerics to doubles. */
  final case class AttrVal(text: Option[String], nums: Array[Double]) {
    def num: Double = nums.headOption.getOrElse(
      throw new IllegalArgumentException("attribute is not numeric"))
  }

  final case class Layout(contiguousAddr: Long, contiguousSize: Long,
                          chunkBtreeAddr: Long, chunkDims: Array[Int])

  /** One object (group or dataset) with its header fully parsed. */
  final case class H5Object(addr: Long,
                            attrs: Map[String, AttrVal],
                            children: Map[String, Long], // group: name → header addr
                            dims: Seq[Int],
                            dtype: Option[Dtype],
                            layout: Option[Layout],
                            deflate: Boolean) {
    def isDataset: Boolean = layout.isDefined
  }

  final class H5File(bytes: Array[Byte]) {
    private val objCache = scala.collection.mutable.Map[Long, H5Object]()
    val rootAddr: Long = parseSuperblock()

    private def buf(pos: Long): ByteBuffer = {
      val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      b.position(pos.toInt)
      b
    }

    private def parseSuperblock(): Long = {
      val sig = Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n')
      require(bytes.length > 96 && sig.indices.forall(i => bytes(i) == sig(i)),
        "not an HDF5 file (bad signature)")
      val b = buf(8)
      val ver = b.get().toInt
      require(ver == 0, s"superblock version $ver unsupported — version 0 " +
        "(classic/earliest format) only; rewrite with libver='earliest'")
      b.get(); b.get(); b.get(); b.get() // fs ver, root ver, reserved, shared ver
      require(b.get() == 8 && b.get() == 8,
        "only 8-byte offsets/lengths supported")
      b.get() // reserved
      b.getShort(); b.getShort(); b.getInt() // leaf k, internal k, flags
      val base = b.getLong()
      require(base == 0, s"non-zero base address $base unsupported")
      b.getLong(); b.getLong(); b.getLong() // free-space, eof, driver info
      // root group symbol table entry: link name offset, header address
      b.getLong()
      b.getLong()
    }

    /** Parse one v1 object header (with continuations) into an H5Object. */
    def objectAt(addr: Long): H5Object = objCache.getOrElseUpdate(addr, {
      val b = buf(addr)
      val ver = b.get().toInt
      require(ver == 1, s"object header version $ver unsupported (v1 only — " +
        "'latest' format objects need fractal heaps, out of scope)")
      b.get() // reserved
      val nmsgs = b.getShort().toInt
      b.getInt() // ref count
      val hdrSize = b.getInt()
      b.getInt() // pad to 8-byte boundary after the 12-byte prefix

      var attrs = Map.empty[String, AttrVal]
      var children = Map.empty[String, Long]
      var dims: Seq[Int] = Nil
      var dtype: Option[Dtype] = None
      var layout: Option[Layout] = None
      var deflate = false

      // message blocks: (start, end) byte windows; continuations append
      var blocks = List((b.position().toLong, b.position().toLong + hdrSize))
      var read = 0
      while (read < nmsgs && blocks.nonEmpty) {
        val (start, end) = blocks.head
        blocks = blocks.tail
        val mb = buf(start)
        while (read < nmsgs && mb.position() + 8 <= end) {
          val mtype = mb.getShort().toInt & 0xffff
          val msize = mb.getShort().toInt & 0xffff
          mb.get(); mb.get(); mb.get(); mb.get() // flags + reserved
          val bodyStart = mb.position()
          mtype match {
            case 0x0000 => // NIL
            case 0x0001 => dims = parseDataspace(slice(mb, msize))
            case 0x0003 => dtype = Some(parseDatatype(slice(mb, msize)))
            case 0x0008 =>
              layout = Some(parseLayout(slice(mb, msize)))
            case 0x000B =>
              deflate = parseFilters(slice(mb, msize))
            case 0x000C =>
              val (n, v) = parseAttribute(slice(mb, msize))
              attrs += n -> v
            case 0x0010 => // continuation: (offset, length)
              val cb = slice(mb, msize)
              val off = cb.getLong(); val len = cb.getLong()
              blocks = (off, off + len) :: blocks
            case 0x0011 => // symbol table: btree + heap
              val sb = slice(mb, msize)
              val btree = sb.getLong(); val heap = sb.getLong()
              children = readGroupBtree(btree, heap)
            case _ => // fill value, mtime, etc — not needed
          }
          mb.position(bodyStart + msize)
          read += 1
        }
      }
      H5Object(addr, attrs, children, dims, dtype, layout, deflate)
    })

    private def slice(b: ByteBuffer, size: Int): ByteBuffer = {
      val s = b.duplicate().order(ByteOrder.LITTLE_ENDIAN)
      s.limit(b.position() + size)
      s
    }

    private def parseDataspace(b: ByteBuffer): Seq[Int] = {
      val ver = b.get().toInt
      val rank = b.get().toInt
      b.get() // flags (maxdims presence — ignored, we read current dims)
      if (ver == 1) { b.get(); b.getInt() } // 5 reserved bytes
      else b.get() // v2: type byte
      (0 until rank).map(_ => b.getLong().toInt)
    }

    private def parseDatatype(b: ByteBuffer): Dtype = {
      val cv = b.get().toInt
      val clazz = cv & 0x0f
      val bits0 = b.get().toInt; b.get(); b.get()
      val size = b.getInt()
      clazz match {
        case 0 => // fixed-point: bit0 order, bit3 signed
          Dtype(0, size, littleEndian = (bits0 & 1) == 0, signed = (bits0 & 8) != 0)
        case 1 => // IEEE float
          require(size == 4 || size == 8, s"float size $size unsupported")
          Dtype(1, size, littleEndian = (bits0 & 1) == 0, signed = true)
        case 3 => // string (fixed length)
          Dtype(3, size, littleEndian = true, signed = false)
        case other => throw new IllegalArgumentException(
          s"datatype class $other unsupported (fixed/float/string only)")
      }
    }

    private def parseLayout(b: ByteBuffer): Layout = {
      val ver = b.get().toInt
      require(ver == 3, s"data layout version $ver unsupported (v3 only)")
      b.get().toInt match {
        case 1 => // contiguous
          Layout(b.getLong(), b.getLong(), Undef, Array.empty)
        case 2 => // chunked: dimensionality = rank+1 (elem size is last)
          val nd = b.get().toInt
          val btree = b.getLong()
          Layout(Undef, 0L, btree, Array.fill(nd)(b.getInt()))
        case 0 => // compact: size u16 then raw data inline
          val size = b.getShort().toInt & 0xffff
          Layout(b.position().toLong, size.toLong, Undef, Array.empty)
        case other => throw new IllegalArgumentException(
          s"layout class $other unsupported")
      }
    }

    /** True if the pipeline is exactly [deflate] (optionally with a
      * disabled entry); anything else unsupported. */
    private def parseFilters(b: ByteBuffer): Boolean = {
      val ver = b.get().toInt
      require(ver == 1, s"filter pipeline version $ver unsupported")
      val n = b.get().toInt
      b.getShort(); b.getInt() // reserved
      var hasDeflate = false
      (0 until n).foreach { _ =>
        val id = b.getShort().toInt
        val nameLen = b.getShort().toInt & 0xffff
        b.getShort() // flags
        val nvals = b.getShort().toInt & 0xffff
        b.position(b.position() + nameLen) // name, already 8-padded by writer
        b.position(b.position() + 4 * nvals + (if (nvals % 2 == 1) 4 else 0))
        id match {
          case 1 => hasDeflate = true
          case other => throw new IllegalArgumentException(
            s"filter id $other unsupported (deflate only)")
        }
      }
      hasDeflate
    }

    private def parseAttribute(b: ByteBuffer): (String, AttrVal) = {
      val ver = b.get().toInt
      require(ver >= 1 && ver <= 3, s"attribute message version $ver unsupported")
      val flags = b.get().toInt // v1: reserved; v2/v3: shared-message flags
      require(ver == 1 || (flags & 0x03) == 0,
        "shared datatype/dataspace attribute messages unsupported — " +
          "parsing the reference as an inline type would yield garbage")
      val nameSize = b.getShort().toInt & 0xffff
      val dtSize = b.getShort().toInt & 0xffff
      val dsSize = b.getShort().toInt & 0xffff
      if (ver == 3) b.get() // name character-set encoding
      def pad8(n: Int): Int = if (ver == 1) (n + 7) / 8 * 8 else n
      val nameBytes = new Array[Byte](pad8(nameSize)); b.get(nameBytes)
      val name = new String(nameBytes, 0,
        math.max(nameSize - 1, 0), java.nio.charset.StandardCharsets.UTF_8)
      val dtBuf = slice(b, dtSize); b.position(b.position() + pad8(dtSize))
      val dt = parseDatatype(dtBuf)
      val dsBuf = slice(b, dsSize); b.position(b.position() + pad8(dsSize))
      val n = parseDataspace(dsBuf).product // rank 0 → product = 1 (scalar)
      val value =
        if (dt.clazz == 3) {
          val sb = new Array[Byte](dt.size * n); b.get(sb)
          val end = sb.indexOf(0.toByte) match { case -1 => sb.length; case i => i }
          AttrVal(Some(new String(sb, 0, end,
            java.nio.charset.StandardCharsets.UTF_8)), Array.empty)
        } else AttrVal(None, Array.tabulate(n)(_ => readElem(b, dt)))
      (name, value)
    }

    private def readElem(b: ByteBuffer, dt: Dtype): Double = {
      b.order(if (dt.littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
      val v = (dt.clazz, dt.size) match {
        case (1, 4) => b.getFloat().toDouble
        case (1, 8) => b.getDouble()
        case (0, 1) => if (dt.signed) b.get().toDouble else (b.get() & 0xff).toDouble
        case (0, 2) => if (dt.signed) b.getShort().toDouble
                       else (b.getShort() & 0xffff).toDouble
        case (0, 4) => if (dt.signed) b.getInt().toDouble
                       else (b.getInt().toLong & 0xffffffffL).toDouble
        case (0, 8) => b.getLong().toDouble
        case other => throw new IllegalArgumentException(s"dtype $other unsupported")
      }
      b.order(ByteOrder.LITTLE_ENDIAN)
      v
    }

    // ---- old-style group traversal --------------------------------------

    private def readGroupBtree(btreeAddr: Long, heapAddr: Long): Map[String, Long] = {
      val heapData = {
        val h = buf(heapAddr)
        require(h.get() == 'H' && h.get() == 'E' && h.get() == 'A' && h.get() == 'P',
          "bad local heap signature")
        h.getInt() // version + 3 reserved
        h.getLong(); h.getLong() // data size, free-list head
        h.getLong() // data segment address
      }
      def heapName(off: Long): String = {
        var end = (heapData + off).toInt
        while (bytes(end) != 0) end += 1
        new String(bytes, (heapData + off).toInt, end - (heapData + off).toInt,
          java.nio.charset.StandardCharsets.UTF_8)
      }
      def walkNode(addr: Long): Seq[(String, Long)] = {
        val b = buf(addr)
        require(b.get() == 'T' && b.get() == 'R' && b.get() == 'E' && b.get() == 'E',
          "bad group B-tree signature")
        require(b.get() == 0, "B-tree node type != group")
        val level = b.get().toInt
        val entries = b.getShort().toInt
        b.getLong(); b.getLong() // left/right siblings
        val kids = (0 until entries).map { _ =>
          b.getLong() // key (heap offset) — unused, SNODs carry the names
          b.getLong() // child address
        }
        if (level > 0) kids.flatMap(walkNode)
        else kids.flatMap { snodAddr =>
          val s = buf(snodAddr)
          require(s.get() == 'S' && s.get() == 'N' && s.get() == 'O' && s.get() == 'D',
            "bad SNOD signature")
          s.get(); s.get() // version, reserved
          val nsyms = s.getShort().toInt
          (0 until nsyms).map { _ =>
            val nameOff = s.getLong()
            val hdr = s.getLong()
            s.getInt(); s.getInt() // cache type, reserved
            s.position(s.position() + 16) // scratch
            heapName(nameOff) -> hdr
          }
        }
      }
      walkNode(btreeAddr).toMap
    }

    /** Resolve an absolute `/a/b/c` path to its object. */
    def resolve(path: String): H5Object = {
      val parts = path.split("/").filter(_.nonEmpty)
      parts.foldLeft(objectAt(rootAddr)) { (cur, name) =>
        cur.children.get(name).map(objectAt).getOrElse(
          throw new IllegalArgumentException(
            s"no '$name' under an object on path '$path' " +
              s"(children: ${cur.children.keys.toSeq.sorted.mkString(", ")})"))
      }
    }

    def exists(path: String): Boolean =
      try { resolve(path); true } catch { case _: IllegalArgumentException => false }

    // ---- dataset reads ---------------------------------------------------

    /** Read a numeric dataset row-major as doubles. */
    def readData(obj: H5Object): Array[Double] = {
      val dt = obj.dtype.getOrElse(
        throw new IllegalArgumentException("object has no datatype (not a dataset)"))
      val lay = obj.layout.getOrElse(
        throw new IllegalArgumentException("object has no layout (not a dataset)"))
      val n = obj.dims.product
      if (lay.chunkBtreeAddr == Undef) {
        require(!obj.deflate, "deflate on a contiguous layout unsupported")
        val b = buf(lay.contiguousAddr)
        Array.tabulate(n)(_ => readElem(b, dt))
      } else readChunked(obj, dt, lay, n)
    }

    private def readChunked(obj: H5Object, dt: Dtype, lay: Layout,
                            n: Int): Array[Double] = {
      val rank = obj.dims.length
      require(lay.chunkDims.length == rank + 1,
        s"chunk rank ${lay.chunkDims.length - 1} != dataset rank $rank")
      val chunkDims = lay.chunkDims.take(rank)
      val out = new Array[Double](n)
      // row-major strides of the full dataset
      val strides = new Array[Long](rank)
      var acc = 1L
      (rank - 1 to 0 by -1).foreach { i => strides(i) = acc; acc *= obj.dims(i) }

      def walk(addr: Long): Unit = {
        val b = buf(addr)
        require(b.get() == 'T' && b.get() == 'R' && b.get() == 'E' && b.get() == 'E',
          "bad chunk B-tree signature")
        require(b.get() == 1, "B-tree node type != raw-data chunk")
        val level = b.get().toInt
        val entries = b.getShort().toInt
        b.getLong(); b.getLong() // siblings
        (0 until entries).foreach { _ =>
          val chunkSize = b.getInt()
          val filterMask = b.getInt()
          val offsets = Array.fill(rank + 1)(b.getLong())
          val child = b.getLong()
          if (level > 0) {
            val mark = b.position()
            walk(child)
            b.position(mark)
          } else {
            val raw = {
              val stored = java.util.Arrays.copyOfRange(
                bytes, child.toInt, child.toInt + chunkSize)
              if (obj.deflate && (filterMask & 1) == 0) inflate(stored) else stored
            }
            scatter(raw, dt, offsets.take(rank), chunkDims, obj.dims, strides, out)
          }
        }
      }
      walk(lay.chunkBtreeAddr)
      out
    }

    private def scatter(raw: Array[Byte], dt: Dtype, off: Array[Long],
                        cdims: Array[Int], dims: Seq[Int], strides: Array[Long],
                        out: Array[Double]): Unit = {
      val rank = cdims.length
      val b = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      val idx = new Array[Int](rank)
      val total = cdims.product
      var k = 0
      while (k < total) {
        var inBounds = true
        var lin = 0L
        var i = 0
        while (i < rank) {
          val g = off(i) + idx(i)
          if (g >= dims(i)) inBounds = false
          lin += g * strides(i)
          i += 1
        }
        val v = readElem(b, dt) // always consume: chunks are fully materialized
        if (inBounds) out(lin.toInt) = v
        // increment row-major index
        var d = rank - 1
        while (d >= 0) {
          idx(d) += 1
          if (idx(d) < cdims(d)) d = -1 else { idx(d) = 0; d -= 1 }
        }
        k += 1
      }
    }

    private def inflate(data: Array[Byte]): Array[Byte] = {
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(data)
        val bos = new java.io.ByteArrayOutputStream(data.length * 4)
        val chunk = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(chunk)
          // all input was provided up front, so ANY zero-progress state
          // (needs input = truncated, needs dictionary, trailing garbage)
          // is fatal — throwing beats spinning forever in an executor
          if (n == 0 && !inf.finished())
            throw new java.io.IOException(
              if (inf.needsDictionary()) "deflate chunk needs a preset dictionary — unsupported"
              else "truncated or stalled deflate stream in chunk")
          bos.write(chunk, 0, n)
        }
        bos.toByteArray
      } finally inf.end()
    }
  }

  def open(bytes: Array[Byte]): H5File = new H5File(bytes)
}
