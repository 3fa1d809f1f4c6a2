package graft

import java.nio.{ByteBuffer, ByteOrder}

/** Hand-assembled HDF5 v0 fixture writer (test scaffolding for the
  * [[graft.multimodal.Hdf5]] subset reader): superblock v0, v1 object
  * headers, old-style groups (v1 B-tree + SNOD + local heap), v1
  * attributes, contiguous and chunked(+deflate) layouts — the byte
  * layout libhdf5's earliest/classic format emits, per the public HDF5
  * File Format Specification. Builds a minimal but structurally complete
  * ODIM_H5 polar volume.
  */
object Hdf5Fixture {

  private val Undef = -1L

  final class Writer {
    private val bb = ByteBuffer.allocate(1 << 20).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(96) // superblock written last, at 0

    private def align8(): Unit =
      while (bb.position() % 8 != 0) bb.put(0.toByte)

    // ---- message bodies --------------------------------------------------

    def dataspace(dims: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + 8 * dims.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(dims.length.toByte).put(0.toByte)
      b.put(0.toByte).putInt(0) // 5 reserved bytes
      dims.foreach(d => b.putLong(d.toLong))
      b.array()
    }

    val dtypeF64: Array[Byte] = {
      val b = ByteBuffer.allocate(8 + 12).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x11.toByte) // version 1, class 1 (float)
      b.put(0x20.toByte).put(0x3f.toByte).put(0.toByte) // LE, mant-norm, sign@63
      b.putInt(8)
      b.putShort(0).putShort(64) // bit offset, precision
      b.put(52.toByte).put(11.toByte).put(0.toByte).put(52.toByte) // exp/mant layout
      b.putInt(1023) // exponent bias
      b.array()
    }

    def dtypeFixed(size: Int, signed: Boolean): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + 4).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x10.toByte) // version 1, class 0
      b.put((if (signed) 0x08 else 0x00).toByte).put(0.toByte).put(0.toByte)
      b.putInt(size)
      b.putShort(0).putShort((size * 8).toShort)
      b.array()
    }

    def dtypeString(size: Int): Array[Byte] = {
      val b = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      b.put(0x13.toByte) // version 1, class 3 (string)
      b.put(0.toByte).put(0.toByte).put(0.toByte) // null-terminated, ASCII
      b.putInt(size)
      b.array()
    }

    /** v1 attribute message: name/datatype/dataspace each 8-padded. */
    private def attrMsg(name: String, dt: Array[Byte], ds: Array[Byte],
                        data: Array[Byte]): Array[Byte] = {
      def pad8(a: Array[Byte]): Array[Byte] =
        java.util.Arrays.copyOf(a, (a.length + 7) / 8 * 8)
      val nm = pad8(name.getBytes("UTF-8") :+ 0.toByte)
      val b = ByteBuffer.allocate(8 + nm.length + pad8(dt).length +
        pad8(ds).length + data.length).order(ByteOrder.LITTLE_ENDIAN)
      b.put(1.toByte).put(0.toByte)
      b.putShort((name.length + 1).toShort)
      b.putShort(dt.length.toShort).putShort(ds.length.toShort)
      b.put(nm).put(pad8(dt)).put(pad8(ds)).put(data)
      b.array()
    }

    def attrDouble(name: String, v: Double): (Int, Array[Byte]) = {
      val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(v)
      (0x000C, attrMsg(name, dtypeF64, dataspace(Nil), d.array()))
    }

    def attrDoubles(name: String, vs: Seq[Double]): (Int, Array[Byte]) = {
      val d = ByteBuffer.allocate(8 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(d.putDouble)
      (0x000C, attrMsg(name, dtypeF64, dataspace(Seq(vs.length)), d.array()))
    }

    def attrLong(name: String, v: Long): (Int, Array[Byte]) = {
      val d = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      (0x000C, attrMsg(name, dtypeFixed(8, signed = true), dataspace(Nil), d.array()))
    }

    def attrString(name: String, v: String): (Int, Array[Byte]) = {
      val payload = v.getBytes("UTF-8") :+ 0.toByte
      (0x000C, attrMsg(name, dtypeString(payload.length), dataspace(Nil), payload))
    }

    // ---- primitives ------------------------------------------------------

    /** v1 object header at the current cursor; returns its address. */
    def objectHeader(msgs: Seq[(Int, Array[Byte])]): Long = {
      align8()
      val addr = bb.position().toLong
      def padded(m: Array[Byte]): Int = (m.length + 7) / 8 * 8
      val hdrSize = msgs.map(m => 8 + padded(m._2)).sum
      bb.put(1.toByte).put(0.toByte).putShort(msgs.length.toShort)
      bb.putInt(1).putInt(hdrSize).putInt(0) // refcount, size, pad
      msgs.foreach { case (t, body) =>
        bb.putShort(t.toShort).putShort(padded(body).toShort)
        bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        bb.put(body)
        align8()
      }
      addr
    }

    /** Old-style group from (name → child header addr); returns the
      * group's object-header address. */
    def group(children: Seq[(String, Long)],
              attrs: Seq[(Int, Array[Byte])] = Nil): Long = {
      // local heap: NUL at 0 (B-tree's low key), names 8-aligned after
      align8()
      val nameOffsets = scala.collection.mutable.Map[String, Long]()
      val heapData = {
        val out = new java.io.ByteArrayOutputStream()
        out.write(0) // empty string at offset 0
        children.map(_._1).foreach { n =>
          while (out.size() % 8 != 0) out.write(0)
          nameOffsets(n) = out.size().toLong
          out.write(n.getBytes("UTF-8")); out.write(0)
        }
        while (out.size() % 8 != 0) out.write(0)
        out.toByteArray
      }
      val heapAddr = bb.position().toLong
      bb.put("HEAP".getBytes); bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      bb.putLong(heapData.length.toLong).putLong(Undef) // size, no free block
      bb.putLong(heapAddr + 32) // data directly after this 32-byte header
      bb.put(heapData)

      // SNOD with all children, sorted by name
      align8()
      val sorted = children.sortBy(_._1)
      val snodAddr = bb.position().toLong
      bb.put("SNOD".getBytes); bb.put(1.toByte).put(0.toByte)
      bb.putShort(sorted.length.toShort)
      sorted.foreach { case (n, hdr) =>
        bb.putLong(nameOffsets(n)).putLong(hdr)
        bb.putInt(0).putInt(0) // cache type 0: reader uses the header msg
        bb.putLong(0).putLong(0) // scratch
      }

      // B-tree: one leaf entry pointing at the SNOD
      align8()
      val btreeAddr = bb.position().toLong
      bb.put("TREE".getBytes); bb.put(0.toByte).put(0.toByte)
      bb.putShort(1)
      bb.putLong(Undef).putLong(Undef)
      bb.putLong(0L) // low key: empty string at heap offset 0
      bb.putLong(snodAddr)
      bb.putLong(sorted.lastOption.map(c => nameOffsets(c._1)).getOrElse(0L))

      val symtab = {
        val b = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
        b.putLong(btreeAddr).putLong(heapAddr)
        b.array()
      }
      objectHeader(attrs :+ (0x0011 -> symtab))
    }

    /** Contiguous little-endian dataset; data elements written raw. */
    def datasetContiguous(dims: Seq[Int], dtype: Array[Byte], elemSize: Int,
                          put: ByteBuffer => Unit,
                          attrs: Seq[(Int, Array[Byte])] = Nil): Long = {
      align8()
      val dataAddr = bb.position().toLong
      val n = dims.product
      put(bb) // caller writes exactly n * elemSize bytes
      val layout = ByteBuffer.allocate(2 + 16).order(ByteOrder.LITTLE_ENDIAN)
      layout.put(3.toByte).put(1.toByte).putLong(dataAddr).putLong(n.toLong * elemSize)
      objectHeader(attrs ++ Seq(
        0x0001 -> dataspace(dims), 0x0003 -> dtype,
        0x0008 -> layout.array()))
    }

    /** Chunked u16 dataset, each chunk deflated, v1 chunk B-tree. */
    def datasetChunkedU16(dims: Seq[Int], chunkDims: Seq[Int],
                          data: Array[Int],
                          attrs: Seq[(Int, Array[Byte])] = Nil): Long = {
      val rank = dims.length
      // materialize + deflate each chunk (row-major chunk grid)
      val chunkGrid = dims.zip(chunkDims).map { case (d, c) => (d + c - 1) / c }
      def chunkAt(ci: Seq[Int]): Array[Byte] = {
        val b = ByteBuffer.allocate(2 * chunkDims.product)
          .order(ByteOrder.LITTLE_ENDIAN)
        def rec(dim: Int, base: Seq[Int]): Unit =
          if (dim == rank) {
            val inBounds = base.zip(dims).forall { case (g, d) => g < d }
            val v = if (inBounds)
              data(base.zip(dims).foldLeft(0) { case (acc, (g, d)) => acc * d + g })
            else 0
            b.putShort(v.toShort)
          } else (0 until chunkDims(dim)).foreach(j =>
            rec(dim + 1, base :+ (ci(dim) * chunkDims(dim) + j)))
        rec(0, Nil)
        val out = new java.io.ByteArrayOutputStream()
        val d = new java.util.zip.DeflaterOutputStream(out)
        d.write(b.array()); d.close()
        out.toByteArray
      }
      val chunkIdxs = chunkGrid.foldLeft(Seq(Seq.empty[Int])) { (acc, g) =>
        acc.flatMap(p => (0 until g).map(p :+ _))
      }
      val written = chunkIdxs.map { ci =>
        val packed = chunkAt(ci)
        align8()
        val addr = bb.position().toLong
        bb.put(packed)
        (ci, addr, packed.length)
      }
      // chunk B-tree leaf
      align8()
      val btreeAddr = bb.position().toLong
      bb.put("TREE".getBytes); bb.put(1.toByte).put(0.toByte)
      bb.putShort(written.length.toShort)
      bb.putLong(Undef).putLong(Undef)
      written.foreach { case (ci, addr, size) =>
        bb.putInt(size).putInt(0) // stored size, filter mask
        ci.zip(chunkDims).foreach { case (c, cd) => bb.putLong(c.toLong * cd) }
        bb.putLong(0L) // element-dimension offset
        bb.putLong(addr)
      }
      bb.putInt(0).putInt(0) // trailing key
      dims.foreach(d => bb.putLong(d.toLong)); bb.putLong(0L)

      val layout = ByteBuffer.allocate(2 + 1 + 8 + 4 * (rank + 1))
        .order(ByteOrder.LITTLE_ENDIAN)
      layout.put(3.toByte).put(2.toByte).put((rank + 1).toByte)
      layout.putLong(btreeAddr)
      chunkDims.foreach(c => layout.putInt(c))
      layout.putInt(2) // element size
      val filters = {
        val b = ByteBuffer.allocate(8 + 8 + 8).order(ByteOrder.LITTLE_ENDIAN)
        b.put(1.toByte).put(1.toByte).putShort(0).putInt(0) // v1, one filter
        b.putShort(1).putShort(0).putShort(0).putShort(1)   // deflate, 1 value
        b.putInt(6).putInt(0)                               // level + odd-pad
        b.array()
      }
      objectHeader(attrs ++ Seq(
        0x0001 -> dataspace(dims), 0x0003 -> dtypeFixed(2, signed = false),
        0x000B -> filters, 0x0008 -> layout.array()))
    }

    /** Superblock at 0 pointing at the root group; returns the file. */
    def finish(rootAddr: Long): Array[Byte] = {
      val end = bb.position()
      bb.position(0)
      bb.put(Array[Byte](0x89.toByte, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n'))
      bb.put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte) // versions
      bb.put(0.toByte).put(8.toByte).put(8.toByte).put(0.toByte) // shared, sizes
      bb.putShort(4).putShort(16).putInt(0) // leaf k, internal k, flags
      bb.putLong(0L).putLong(Undef).putLong(end.toLong).putLong(Undef)
      bb.putLong(0L).putLong(rootAddr) // root entry: name off, header addr
      bb.putInt(0).putInt(0)           // cache type, reserved
      bb.putLong(0L).putLong(0L)       // scratch
      java.util.Arrays.copyOf(bb.array(), end)
    }
  }

  /** A structurally complete two-elevation ODIM_H5 polar volume:
    * el 0.5° with explicit per-ray azimuths (how.startazA/stopazA) and
    * chunked+deflate u16 data with a nodata bin; el 1.5° with uniform
    * azimuths and defaults. 4 rays × 3 bins each.
    */
  def odimVolume(): Array[Byte] = {
    val w = new Writer
    // /what + /where
    val whatAddr = w.group(Nil, Seq(
      w.attrString("object", "PVOL"), w.attrString("source", "RAD:TEST1")))
    val whereAddr = w.group(Nil, Seq(
      w.attrDouble("lat", -22.96), w.attrDouble("lon", -43.26),
      w.attrDouble("height", 80.0)))

    // dataset1: el 0.5, explicit azimuths, chunked+deflate u16, nodata=999
    // raw grid (4 rays × 3 bins), chunks 2×2 → partial chunks exercised
    val raw1 = Array(
      10, 11, 12,
      20, 21, 999, // nodata in ray 1, bin 2
      30, 31, 32,
      40, 41, 42)
    val d1what = w.group(Nil, Seq(
      w.attrString("quantity", "DBZH"),
      w.attrDouble("gain", 0.5), w.attrDouble("offset", -32.0),
      w.attrDouble("nodata", 999.0), w.attrDouble("undetect", 0.0)))
    val d1data = w.datasetChunkedU16(Seq(4, 3), Seq(2, 2), raw1)
    val data1 = w.group(Seq("what" -> d1what, "data" -> d1data))
    val ds1where = w.group(Nil, Seq(
      w.attrDouble("elangle", 0.5), w.attrLong("nbins", 3), w.attrLong("nrays", 4),
      w.attrDouble("rstart", 0.0), w.attrDouble("rscale", 1000.0)))
    val ds1how = w.group(Nil, Seq(
      w.attrDoubles("startazA", Seq(350.0, 80.0, 170.0, 260.0)),
      w.attrDoubles("stopazA", Seq(20.0, 100.0, 190.0, 280.0))))
    val ds1 = w.group(Seq("where" -> ds1where, "how" -> ds1how, "data1" -> data1))

    // dataset2: el 1.5, uniform azimuths, contiguous f64 data, no nodata
    val raw2 = Array(
      100.0, 101.0, 102.0,
      110.0, 111.0, 112.0,
      120.0, 121.0, 122.0,
      130.0, 131.0, 132.0)
    val d2what = w.group(Nil, Seq(
      w.attrString("quantity", "DBZH"),
      w.attrDouble("gain", 1.0), w.attrDouble("offset", 0.0)))
    val d2data = w.datasetContiguous(Seq(4, 3), w.dtypeF64, 8,
      b => raw2.foreach(b.putDouble))
    val data2 = w.group(Seq("what" -> d2what, "data" -> d2data))
    val ds2where = w.group(Nil, Seq(
      w.attrDouble("elangle", 1.5), w.attrLong("nbins", 3), w.attrLong("nrays", 4),
      w.attrDouble("rstart", 0.0), w.attrDouble("rscale", 1000.0)))
    val ds2 = w.group(Seq("where" -> ds2where, "data1" -> data2))

    val root = w.group(Seq(
      "what" -> whatAddr, "where" -> whereAddr,
      "dataset1" -> ds1, "dataset2" -> ds2))
    w.finish(root)
  }
}
