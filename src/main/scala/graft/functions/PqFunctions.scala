package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** Product-quantization ANN kernels (SURVEY §2.9 L32/L35, the FAISS
  * IndexPQ / IndexIVFPQ layout, Jégou et al. 2011) in the engine's
  * native-expression style.
  *
  * Design (and the reason this file exists): codebooks are O(M·K·d′) and
  * per-query distance tables are O(|queries|·M·K) — BOTH are driver
  * state in FAISS and both are driver state here. Training is one
  * aggregation job per Lloyd round (a single 1-row ObjectHashAggregate
  * whose buffer carries the quantized-long sums for every (m, k) cell —
  * partials merge map-side, the corpus never shuffles); encoding and
  * ADC scoring are scan-stage expressions against the broadcast-by-
  *-closure codebook/tables. The first-draft DataFrame form kept the
  * codebook as a 128-row frame and re-joined it per pass through
  * interpreted HOF lambdas — 14 jobs and ~6 s at a 2 000-row gate SF;
  * this form is 4–5 jobs, all narrow.
  *
  * Determinism: Lloyd sums quantize each coordinate to floor(v·1e6+0.5)
  * longs (merge-order-independent, the CentroidAggregator convention);
  * every argmin/argmax tie-breaks on the lowest cluster id; all driver
  * math iterates in sorted-id order.
  */
final class PqModel(val subDim: Int,
    val ks: Array[Array[Int]], // [m][entry] → cluster id, ascending
    val cents: Array[Array[Array[Double]]]) // [m][entry][subDim]
  extends Serializable {
  def m: Int = ks.length
}

final class CoarseModel(val cids: Array[Long], // ascending
    val cents: Array[Array[Double]]) extends Serializable

/** Per-query ADC tables: query q probes cells[q]; dts[q][cellIdx][m]
  * is indexed by the ENTRY index pq_encode emits. l32 (no coarse
  * stage) uses the single dummy cell 0 for every query. */
final class PqQueryTables(val qids: Array[Long],
    val cells: Array[Array[Long]],
    val dts: Array[Array[Array[Array[Double]]]]) extends Serializable

object PqCore {

  // ---- shared math (used by the driver, aggregators, and expressions) ----

  /** Nearest codebook entry of subspace m for sub[from, from+subDim);
    * strict < keeps the lowest cluster id on exact ties. */
  def nearestEntry(pq: PqModel, m: Int, sub: Array[Double], from: Int): Int = {
    val cents = pq.cents(m)
    var best = Double.PositiveInfinity
    var bestE = 0
    var e = 0
    while (e < cents.length) {
      val c = cents(e)
      var d = 0.0
      var j = 0
      while (j < pq.subDim) {
        val dd = sub(from + j) - c(j); d += dd * dd; j += 1
      }
      if (d < best) { best = d; bestE = e }
      e += 1
    }
    bestE
  }

  /** Nearest coarse cell by cosine; strict > keeps the lowest cid on
    * exact ties (cids ascending). */
  def nearestCell(cm: CoarseModel, vec: Array[Double]): Int = {
    var best = Double.NegativeInfinity
    var bestI = 0
    var i = 0
    while (i < cm.cents.length) {
      val c = cm.cents(i)
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var j = 0
      while (j < c.length && j < vec.length) {
        dot += vec(j) * c(j); nx += vec(j) * vec(j); ny += c(j) * c(j); j += 1
      }
      val s = dot / (math.sqrt(nx) * math.sqrt(ny))
      if (s > best) { best = s; bestI = i }
      i += 1
    }
    bestI
  }

  def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    out
  }

  // ---- expression kernels (called from generated code) ----

  /** Encode a vector (residual-ized first when coarse != null) to its M
    * entry indices. */
  def encode(pq: PqModel, coarse: CoarseModel, a: ArrayData,
      isFloat: Boolean): ArrayData = {
    val vec = toDoubles(a, isFloat)
    if (coarse != null) {
      val cell = nearestCell(coarse, vec)
      val c = coarse.cents(cell)
      var j = 0
      while (j < vec.length && j < c.length) { vec(j) -= c(j); j += 1 }
    }
    val codes = new Array[Int](pq.m)
    var m = 0
    while (m < pq.m) {
      codes(m) = nearestEntry(pq, m, vec, m * pq.subDim)
      m += 1
    }
    new GenericArrayData(codes)
  }

  def cell(coarse: CoarseModel, a: ArrayData, isFloat: Boolean): Long =
    coarse.cids(nearestCell(coarse, toDoubles(a, isFloat)))

  /** For every query probing `cid`: the ADC distance of the candidate's
    * codes — array<struct<qid, adist>> (empty when no query probes). */
  def adcAll(t: PqQueryTables, cid: Long, codes: ArrayData): ArrayData = {
    val out = new java.util.ArrayList[AnyRef](t.qids.length)
    var q = 0
    while (q < t.qids.length) {
      val cells = t.cells(q)
      var ci = 0
      while (ci < cells.length) {
        if (cells(ci) == cid) {
          val dt = t.dts(q)(ci)
          var d = 0.0
          var m = 0
          while (m < dt.length) { d += dt(m)(codes.getInt(m)); m += 1 }
          out.add(new GenericInternalRow(
            Array[Any](t.qids(q), d)))
          ci = cells.length
        } else ci += 1
      }
      q += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }

  /** Exact L2² of a candidate vector to query `qid` (the re-rank stage;
    * float-to-double per element, left-to-right accumulation). */
  def l2ToQuery(qv: java.util.HashMap[java.lang.Long, Array[Float]],
      qid: Long, a: ArrayData): Double = {
    val q = qv.get(qid)
    var d = 0.0
    var i = 0
    val n = math.min(q.length, a.numElements())
    while (i < n) {
      val dd = q(i).toDouble - a.getFloat(i).toDouble; d += dd * dd; i += 1
    }
    d
  }

  // ---- driver-side model building ----

  private def quantize(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong

  /** Seed codebook: vector i of `seeds` contributes its m-th subvector
    * as cluster id i of subspace m (the classic first-K-vectors seed). */
  def seedModel(seeds: Array[Array[Double]], m: Int): PqModel = {
    val subDim = seeds.head.length / m
    val ks = Array.tabulate(m)(_ => seeds.indices.toArray)
    val cents = Array.tabulate(m)(mi =>
      seeds.map(v => java.util.Arrays.copyOfRange(v, mi * subDim, (mi + 1) * subDim)))
    new PqModel(subDim, ks, cents)
  }

  /** One Lloyd round over the corpus: a single-group aggregation whose
    * buffer holds quantized-long sums + counts per (m, entry); cells
    * that lose all members drop out (mirroring a groupBy rebuild). */
  def lloydRound(df: org.apache.spark.sql.DataFrame, vecCol: Column,
      pq: PqModel, coarse: CoarseModel): PqModel = {
    val row = df.agg(udaf(new PqTrainAggregator(pq, coarse)).apply(vecCol))
      .collect().head.getStruct(0)
    val sums = row.getSeq[Long](0).toArray
    val cnt = row.getSeq[Long](1).toArray
    rebuild(pq, sums, cnt)
  }

  private[functions] def rebuild(pq: PqModel, sums: Array[Long],
      cnt: Array[Long]): PqModel = {
    val ks = new Array[Array[Int]](pq.m)
    val cents = new Array[Array[Array[Double]]](pq.m)
    var off = 0 // entries laid out m-major, entry-minor
    var base = 0
    for (m <- 0 until pq.m) {
      val nE = pq.ks(m).length
      val keep = (0 until nE).filter(e => cnt(off + e) > 0)
      ks(m) = keep.map(e => pq.ks(m)(e)).toArray
      cents(m) = keep.map { e =>
        val c = new Array[Double](pq.subDim)
        for (j <- 0 until pq.subDim)
          c(j) = sums(base + e * pq.subDim + j).toDouble / cnt(off + e) / 1e6
        c
      }.toArray
      off += nE
      base += nE * pq.subDim
    }
    new PqModel(pq.subDim, ks, cents)
  }

  /** One coarse Lloyd round (cosine assignment), same buffer scheme. */
  def coarseRound(df: org.apache.spark.sql.DataFrame, vecCol: Column,
      cm: CoarseModel): CoarseModel = {
    val row = df.agg(udaf(new CoarseTrainAggregator(cm)).apply(vecCol))
      .collect().head.getStruct(0)
    val sums = row.getSeq[Long](0).toArray
    val cnt = row.getSeq[Long](1).toArray
    val dim = cm.cents.head.length
    val keep = cm.cids.indices.filter(i => cnt(i) > 0)
    new CoarseModel(
      keep.map(cm.cids).toArray,
      keep.map(i => Array.tabulate(dim)(j =>
        sums(i * dim + j).toDouble / cnt(i) / 1e6)).toArray)
  }

  /** ADC distance tables for `queries` against `pq` (+`coarse`: probe
    * the `nProbe` nearest cells and build per-probed-cell residual
    * tables; null coarse = the single dummy cell 0). */
  def buildTables(queries: Array[(Long, Array[Float])], pq: PqModel,
      coarse: CoarseModel, nProbe: Int): PqQueryTables = {
    val qids = queries.map(_._1)
    val cells = new Array[Array[Long]](queries.length)
    val dts = new Array[Array[Array[Array[Double]]]](queries.length)
    for (qi <- queries.indices) {
      val qd = queries(qi)._2.map(_.toDouble)
      val probed: Array[(Long, Array[Double])] =
        if (coarse == null) Array(0L -> qd)
        else {
          // top-nProbe cells by cosine desc, tie → lowest cid
          val scored = coarse.cids.indices.map { i =>
            val c = coarse.cents(i)
            var dot = 0.0; var nx = 0.0; var ny = 0.0
            for (j <- qd.indices if j < c.length) {
              dot += qd(j) * c(j); nx += qd(j) * qd(j); ny += c(j) * c(j)
            }
            (coarse.cids(i), dot / (math.sqrt(nx) * math.sqrt(ny)))
          }
          scored.sortBy { case (cid, s) => (-s, cid) }.take(nProbe).map {
            case (cid, _) =>
              val c = coarse.cents(coarse.cids.indexOf(cid))
              cid -> Array.tabulate(qd.length)(j =>
                qd(j) - (if (j < c.length) c(j) else 0.0))
          }.toArray
        }
      cells(qi) = probed.map(_._1)
      dts(qi) = probed.map { case (_, res) =>
        Array.tabulate(pq.m) { m =>
          pq.cents(m).map { c =>
            var d = 0.0
            for (j <- 0 until pq.subDim) {
              val dd = res(m * pq.subDim + j) - c(j); d += dd * dd
            }
            d
          }
        }
      }
    }
    new PqQueryTables(qids, cells, dts)
  }
}

// ---------------------------------------------------------------------------
// Aggregators: one Lloyd round = one single-group aggregation
// ---------------------------------------------------------------------------

case class PqTrainBuf(var sums: Array[Long], var cnt: Array[Long])

/** Buffer layout: entries m-major, entry-minor (matching PqCore.rebuild);
  * sums is entries × subDim quantized longs, cnt is entries longs. */
class PqTrainAggregator(pq: PqModel, coarse: CoarseModel)
  extends Aggregator[Seq[Float], PqTrainBuf, PqTrainBuf] {
  private val nEntries = pq.ks.map(_.length).sum

  def zero: PqTrainBuf =
    PqTrainBuf(new Array[Long](nEntries * pq.subDim), new Array[Long](nEntries))

  def reduce(b: PqTrainBuf, v: Seq[Float]): PqTrainBuf = {
    val vec = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { vec(i) = v(i).toDouble; i += 1 }
    if (coarse != null) {
      val c = coarse.cents(PqCore.nearestCell(coarse, vec))
      var j = 0
      while (j < vec.length && j < c.length) { vec(j) -= c(j); j += 1 }
    }
    var off = 0; var base = 0
    var m = 0
    while (m < pq.m) {
      val e = PqCore.nearestEntry(pq, m, vec, m * pq.subDim)
      b.cnt(off + e) += 1
      var j = 0
      while (j < pq.subDim) {
        b.sums(base + e * pq.subDim + j) +=
          math.floor(vec(m * pq.subDim + j) * 1e6 + 0.5).toLong
        j += 1
      }
      off += pq.ks(m).length
      base += pq.ks(m).length * pq.subDim
      m += 1
    }
    b
  }

  def merge(x: PqTrainBuf, y: PqTrainBuf): PqTrainBuf = {
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    i = 0
    while (i < x.cnt.length) { x.cnt(i) += y.cnt(i); i += 1 }
    x
  }

  def finish(b: PqTrainBuf): PqTrainBuf = b
  def bufferEncoder: Encoder[PqTrainBuf] = Encoders.product[PqTrainBuf]
  def outputEncoder: Encoder[PqTrainBuf] = Encoders.product[PqTrainBuf]
}

/** Coarse k-means round: cosine argmax assignment, sums over the FULL
  * vector per cell. Buffer: cells × dim quantized longs + cells counts. */
class CoarseTrainAggregator(cm: CoarseModel)
  extends Aggregator[Seq[Float], PqTrainBuf, PqTrainBuf] {
  private val dim = cm.cents.head.length

  def zero: PqTrainBuf =
    PqTrainBuf(new Array[Long](cm.cids.length * dim),
      new Array[Long](cm.cids.length))

  def reduce(b: PqTrainBuf, v: Seq[Float]): PqTrainBuf = {
    val vec = new Array[Double](v.length)
    var i = 0
    while (i < v.length) { vec(i) = v(i).toDouble; i += 1 }
    val c = PqCore.nearestCell(cm, vec)
    b.cnt(c) += 1
    var j = 0
    while (j < dim && j < vec.length) {
      b.sums(c * dim + j) += math.floor(vec(j) * 1e6 + 0.5).toLong
      j += 1
    }
    b
  }

  def merge(x: PqTrainBuf, y: PqTrainBuf): PqTrainBuf = {
    var i = 0
    while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
    i = 0
    while (i < x.cnt.length) { x.cnt(i) += y.cnt(i); i += 1 }
    x
  }

  def finish(b: PqTrainBuf): PqTrainBuf = b
  def bufferEncoder: Encoder[PqTrainBuf] = Encoders.product[PqTrainBuf]
  def outputEncoder: Encoder[PqTrainBuf] = Encoders.product[PqTrainBuf]
}

// ---------------------------------------------------------------------------
// Expressions: scan-stage encode / cell / ADC / exact re-rank
// ---------------------------------------------------------------------------

/** `pq_encode(vec)` → array<int> of M codebook ENTRY indices (residual
  * vs the coarse cell first when a coarse model is bound). */
case class PqEncodeExpression(child: Expression, pq: PqModel,
    coarse: CoarseModel) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PqCore.encode(pq, coarse, input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pqRef = ctx.addReferenceObj("pqModel", pq, "graft.functions.PqModel")
    val cRef =
      if (coarse == null) "(graft.functions.CoarseModel) null"
      else ctx.addReferenceObj("coarseModel", coarse, "graft.functions.CoarseModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqCore.encode($pqRef, $cRef, $c, $isFloat);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): PqEncodeExpression = copy(child = newChild)
}

/** `ivf_cell(vec)` → the coarse cell id (cosine argmax). */
case class CoarseCellExpression(child: Expression, coarse: CoarseModel)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ivf_cell"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    PqCore.cell(coarse, input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("coarseModel", coarse,
      "graft.functions.CoarseModel")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqCore.cell($cRef, $c, $isFloat);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CoarseCellExpression = copy(child = newChild)
}

/** `pq_adc_all(cell, codes)` → array<struct<qid, adist>>: the ADC
  * distance for every query probing the candidate's cell. */
case class PqAdcAllExpression(left: Expression, right: Expression,
    tables: PqQueryTables) extends BinaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("qid", LongType, nullable = false),
      StructField("adist", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pq_adc_all"

  override def nullSafeEval(cid: Any, codes: Any): Any =
    PqCore.adcAll(tables, cid.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqTables", tables,
      "graft.functions.PqQueryTables")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqCore.adcAll($tRef, $a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcAllExpression =
    copy(left = newLeft, right = newRight)
}

/** `query_l2(qid, vec)` → exact L2² to the bound query vector (re-rank). */
case class QueryL2Expression(left: Expression, right: Expression,
    queryVecs: java.util.HashMap[java.lang.Long, Array[Float]])
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "query_l2"

  override def nullSafeEval(qid: Any, vec: Any): Any =
    PqCore.l2ToQuery(queryVecs, qid.asInstanceOf[Long],
      vec.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("pqQueryVecs", queryVecs,
      "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PqCore.l2ToQuery($qRef, $a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): QueryL2Expression =
    copy(left = newLeft, right = newRight)
}
