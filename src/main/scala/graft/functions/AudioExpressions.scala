package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Real audio decode for the multimodal column story — the audio
  * sibling of ImageCore's PNG path: WAV bytes → (sample count, sample
  * rate, exact |amplitude| sum, peak) via JDK javax.sound — no external
  * dependency, deterministic for lossless PCM. Same scan-stage shape:
  * bytes stay in the row, decode happens once per row inside
  * whole-stage codegen, and only O(1) stats leave the operator — the
  * waveform never materializes in the plan.
  *
  * Absolute-amplitude SUMS (not means) are emitted so downstream
  * arithmetic — and the DuckDB oracle, which recomputes them
  * analytically from the fixture's sample formula — stays in exact
  * integers.
  */
object AudioCore {
  /** Decode bytes → (n_samples, channels, sample_rate, sum_abs, peak),
    * or null if the payload is not decodable 16-bit integer PCM
    * (NULL-on-error, like TRY()). Multi-channel audio sums across
    * channels (each frame contributes every channel's sample);
    * n_samples counts VALUES (frames × channels), and the channel
    * count rides along so duration = n_samples / (rate × channels) is
    * frame-correct for stereo (r12 ADVICE: the old 4-field struct made
    * stereo duration 2× too long). */
  def stats(bytes: Array[Byte]): InternalRow = {
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 ||
          fmt.getEncoding !=
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return null
      val data = ais.readAllBytes()
      val big = fmt.isBigEndian
      val n = data.length / 2
      var sum = 0L
      var peak = 0L
      var i = 0
      while (i < n) {
        val lo = data(2 * i + (if (big) 1 else 0)) & 0xff
        val hi = data(2 * i + (if (big) 0 else 1)).toInt
        val v = (hi << 8) | lo
        val a = math.abs(v).toLong
        sum += a
        if (a > peak) peak = a
        i += 1
      }
      InternalRow(n.toLong, fmt.getChannels, fmt.getSampleRate.toInt,
        sum, peak)
    } catch {
      // NonFatal: javax.sound throws UnsupportedAudioFileException and
      // assorted RuntimeExceptions on malformed payloads; the TRY()-like
      // contract is NULL for hostile bytes, not a crash
      case scala.util.control.NonFatal(_) => null
    }
  }
}

/** `audio_stats(binary)` → struct<n_samples bigint, channels int,
  * sample_rate int, sum_abs bigint, peak bigint>, NULL when the payload
  * is not decodable 16-bit PCM. */
case class AudioStatsExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("peak", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_stats"

  override protected def nullSafeEval(input: Any): Any =
    AudioCore.stats(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.AudioCore.stats($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): AudioStatsExpression = copy(child = newChild)
}
