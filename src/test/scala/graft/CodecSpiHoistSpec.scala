package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal

/** Pins the codec SPI-hoist invariant (round 10's q229/q230 decade fix):
  * media codec providers are resolved once per PARTITION, never per
  * record, and the code physically cannot call the static entry points
  * that funnel every call through a JVM-global synchronized provider
  * registry (`ImageIO.read/write`, anything on `AudioSystem` —
  * IIORegistry / JDK13Services locks that serialized all 32 codec tasks
  * and cost q229 28× at sf10). Until this spec, the hoist was protected
  * only by a bench number; a refactor could silently reintroduce the
  * lock and no correctness gate would notice.
  *
  * Two independent layers:
  *  1. FREQUENCY — every registry-consulting helper counts itself into
  *     `Multimodal.providerResolutions`, keyed by the task's
  *     `graft.codec.scope` local property (set here, so concurrent
  *     suites' codec work cannot contaminate the count). Each modality
  *     pipeline over P partitions must resolve exactly 2·P times (one
  *     encoder + one decoder per partition), with records ≫ partitions
  *     so a per-record regression cannot hide.
  *  2. STRUCTURE — a constant-pool scan of every compiled
  *     `graft/ops/Multimodal*` class asserts zero method references to
  *     `javax.sound.sampled.AudioSystem` (the hoist uses the
  *     `ServiceLoader` SPI directly) and none to `ImageIO.read`/`write`
  *     (registry queries like `getImageReadersByFormatName` stay legal —
  *     layer 1 bounds their frequency). This catches the regression at
  *     compile output, before any bench runs.
  */
class CodecSpiHoistSpec extends SparkSpec {

  private def scoped(scope: String): Long =
    Option(Multimodal.providerResolutions.get(scope)).map(_.get).getOrElse(0L)

  /** Run `body` with the codec-scope local property set, return the
    * resolution count it caused. */
  private def resolutions[T](scope: String)(body: => T): (T, Long) = {
    spark.sparkContext.setLocalProperty("graft.codec.scope", scope)
    try {
      val before = scoped(scope)
      val r = body
      (r, scoped(scope) - before)
    } finally spark.sparkContext.setLocalProperty("graft.codec.scope", null)
  }

  private val P = 3
  private val Records = 60
  private def docs =
    spark.range(Records.toLong).select(col("id").as("doc_id")).repartition(P)

  /** Per-partition hoist bound, tolerant of task re-execution. A clean
    * local run resolves exactly 2·P times (one encoder + one decoder per
    * partition, single fused stage); a retried or speculatively
    * re-executed task legitimately re-resolves (+2 per extra attempt),
    * which is a scheduler event, not an SPI-hoist regression — so allow
    * up to `MaxTaskAttempts` attempts per task rather than flaking.
    * The bound stays far below `Records`, so the regression this spec
    * exists for (per-RECORD resolution, res ≈ records or 2·records)
    * still fails loudly. */
  private val MaxTaskAttempts = 4 // Spark's default spark.task.maxFailures
  private def assertHoisted(res: Long, what: String): Unit = {
    val clean = 2L * P
    val bound = clean * MaxTaskAttempts
    assert(bound < Records,
      s"fixture invariant: retry bound $bound must stay below $Records records")
    assert(res >= clean && res <= bound,
      s"expected $clean provider resolutions for $P partitions in the $what " +
        s"pipeline (up to $bound under task re-execution), got $res — a " +
        "per-record resolution would reintroduce the JVM-global registry lock")
  }

  test("png pipeline resolves codec providers once per partition, not per record") {
    val (n, res) = resolutions("spi-png") {
      Multimodal.decodePngStats(Multimodal.encodePng(docs)).count()
    }
    assert(n == Records.toLong)
    assertHoisted(res, "png")
  }

  test("wav pipeline resolves codec providers once per partition, not per record") {
    val (n, res) = resolutions("spi-wav") {
      Multimodal.decodeWavStats(Multimodal.encodeWav(docs)).count()
    }
    assert(n == Records.toLong)
    assertHoisted(res, "wav")
  }

  test("video pipeline resolves codec providers once per partition, not per record") {
    val (n, res) = resolutions("spi-video") {
      Multimodal.sampleFrames(Multimodal.encodeVideo(docs)).count()
    }
    assert(n > Records.toLong) // ≥1 sampled frame per doc
    assertHoisted(res, "video")
  }

  // ------------------------------------------------------------ structure

  /** All (class, method) pairs referenced by Methodref/InterfaceMethodref
    * entries in a class file's constant pool. */
  private def methodRefs(b: Array[Byte]): Seq[(String, String)] = {
    def u1(i: Int) = b(i) & 0xff
    def u2(i: Int) = (u1(i) << 8) | u1(i + 1)
    require(b.length > 10 && u2(0) == 0xcafe && u2(2) == 0xbabe, "not a class file")
    val cpCount = u2(8)
    val utf8 = new Array[String](cpCount)
    val classNameIdx = new Array[Int](cpCount)
    val natNameIdx = new Array[Int](cpCount)
    val refs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 10
    var slot = 1
    while (slot < cpCount) {
      val tag = u1(i)
      tag match {
        case 1 => // Utf8
          val len = u2(i + 1)
          utf8(slot) = new String(b, i + 3, len, java.nio.charset.StandardCharsets.UTF_8)
          i += 3 + len; slot += 1
        case 7 => // Class
          classNameIdx(slot) = u2(i + 1); i += 3; slot += 1
        case 8 | 16 | 19 | 20 => i += 3; slot += 1 // String/MethodType/Module/Package
        case 15 => i += 4; slot += 1 // MethodHandle
        case 3 | 4 => i += 5; slot += 1 // Integer/Float
        case 9 | 17 | 18 => i += 5; slot += 1 // Fieldref/Dynamic/InvokeDynamic
        case 12 => // NameAndType
          natNameIdx(slot) = u2(i + 1); i += 5; slot += 1
        case 10 | 11 => // Methodref / InterfaceMethodref
          refs += ((u2(i + 1), u2(i + 3))); i += 5; slot += 1
        case 5 | 6 => i += 9; slot += 2 // Long/Double take two slots
        case t => fail(s"unknown constant-pool tag $t at offset $i")
      }
    }
    refs.toSeq.map { case (ci, ni) =>
      (utf8(classNameIdx(ci)), utf8(natNameIdx(ni)))
    }
  }

  test("bytecode: no Multimodal class references AudioSystem or ImageIO.read/write") {
    val loc = Multimodal.getClass.getProtectionDomain.getCodeSource.getLocation
    val dir = new java.io.File(new java.io.File(loc.toURI), "graft/ops")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith("Multimodal") && f.getName.endsWith(".class"))
    assert(files.nonEmpty, s"no Multimodal classes under $dir")
    val offenders = files.toSeq.flatMap { f =>
      methodRefs(java.nio.file.Files.readAllBytes(f.toPath)).collect {
        case ("javax/sound/sampled/AudioSystem", m) =>
          s"${f.getName}: AudioSystem.$m"
        case ("javax/imageio/ImageIO", m) if m == "read" || m == "write" =>
          s"${f.getName}: ImageIO.$m"
      }
    }
    assert(offenders.isEmpty,
      "JVM-global-locking codec statics referenced (resolve providers per " +
        s"partition via the SPI instead): ${offenders.mkString("; ")}")
  }
}
