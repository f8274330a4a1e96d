package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Mutable aggregation holder: starts empty, adopts the first sketch's
  * (depth, width, seed) geometry, then merges in place. */
final class CmsBuffer(var cms: CountMinSketch) {
  def absorb(bytes: Array[Byte]): Unit = {
    val in = CountMinSketch.readFrom(bytes)
    if (cms == null) cms = in else cms.mergeInPlace(in)
  }
  def absorbBuffer(other: CmsBuffer): Unit =
    if (other.cms != null) {
      if (cms == null) cms = other.cms else cms.mergeInPlace(other.cms)
    }
  def toBytes: Array[Byte] = if (cms == null) Array.empty else cms.toByteArray
}

/** `cms_merge(sketch)` — union of serialized count-min sketches (the
  * binary column the built-in `count_min_sketch` aggregate emits). CMS
  * merge is exact counter addition, so a rollup of per-bucket sketches
  * is IDENTICAL to one sketch built over the raw rows (same geometry +
  * seed) — the property that makes a persisted frequency layer
  * re-aggregable along any dimension without touching raw data. Runs in
  * ObjectHashAggregate with map-side partial merges; mismatched
  * geometries throw (IncompatibleMergeException) rather than corrupt. */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CmsBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cms_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized count-min sketch) argument")

  override def createAggregationBuffer(): CmsBuffer = new CmsBuffer(null)

  override def update(buffer: CmsBuffer,
                      input: org.apache.spark.sql.catalyst.InternalRow): CmsBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.absorb(v.asInstanceOf[Array[Byte]])
    buffer
  }

  override def merge(buffer: CmsBuffer, other: CmsBuffer): CmsBuffer = {
    buffer.absorbBuffer(other)
    buffer
  }

  override def eval(buffer: CmsBuffer): Any =
    if (buffer.cms == null) null else buffer.toBytes

  override def serialize(buffer: CmsBuffer): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): CmsBuffer =
    if (bytes.isEmpty) new CmsBuffer(null)
    else new CmsBuffer(CountMinSketch.readFrom(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, item)` — point frequency estimate from a
  * serialized count-min sketch (one-sided error: never under-counts).
  * Item may be bigint or string; string items hash as their UTF-8 bytes,
  * matching what the `count_min_sketch` build aggregate added. The
  * deserialized sketch is cached per (expression, partition) while the
  * binary value is reference-equal — the common "one merged sketch
  * probed for many items" shape deserializes once, not per row. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  // Strict check, NOT ImplicitCastInputTypes: the implicit-cast rules
  // would also accept a STRING first argument (String→Binary is an
  // allowed implicit cast), turning a clean analysis-time error into
  // runtime garbage deserialization. Natural integer literals coerce in
  // the SQL registration builder instead (GraftFunctions.widenToLong).
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch as its first argument")
    else right.dataType match {
      case LongType | _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName item must be bigint or string, got $other")
    }

  @transient private var cachedBytes: AnyRef = _
  @transient private var cachedCms: CountMinSketch = _

  private def sketchFor(bytes: Array[Byte]): CountMinSketch = {
    if (!(bytes.asInstanceOf[AnyRef] eq cachedBytes)) {
      cachedCms = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    cachedCms
  }

  /** Shared by interpreted eval and generated code (the expression rides
    * into codegen as a reference object — the sketch cache lives with
    * it). */
  def estimate(sketch: Array[Byte], item: Any): Long = {
    val cms = sketchFor(sketch)
    item match {
      case s: UTF8String => cms.estimateCount(s.getBytes)
      case other => cms.estimateCount(other)
    }
  }

  protected override def nullSafeEval(sketch: Any, item: Any): Any =
    estimate(sketch.asInstanceOf[Array[Byte]], item)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsEstimate", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (s, i) =>
      s"${ev.value} = $ref.estimate($s, (Object) $i);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Stable binary codec for a Greenwald–Khanna quantile summary
  * ([[org.apache.spark.sql.catalyst.util.QuantileSummaries]], the sketch
  * behind Spark's approxQuantile): explicit little-format fields, not
  * Java serialization, so persisted layers survive Spark upgrades.
  * Layout: version:int, relativeError:double, compressThreshold:int,
  * count:long, n:int, then n × (value:double, g:long, delta:long). */
object QuantileCodec {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  val Version = 1

  def write(qs: QuantileSummaries): Array[Byte] = {
    val c = qs.compress()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(Version)
    out.writeDouble(c.relativeError)
    out.writeInt(c.compressThreshold)
    out.writeLong(c.count)
    val s = c.sampled
    out.writeInt(s.length)
    s.foreach { st =>
      out.writeDouble(st.value); out.writeLong(st.g); out.writeLong(st.delta)
    }
    out.flush()
    bos.toByteArray
  }

  def read(bytes: Array[Byte]): QuantileSummaries = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val v = in.readInt()
    require(v == Version, s"quantile sketch version $v unsupported")
    val relErr = in.readDouble()
    val thresh = in.readInt()
    val count = in.readLong()
    val n = in.readInt()
    val sampled = Array.tabulate(n) { _ =>
      new QuantileSummaries.Stats(in.readDouble(), in.readLong(), in.readLong())
    }
    new QuantileSummaries(thresh, relErr, sampled, count, true)
  }
}

/** `quantile_sketch(x)` — build a serialized Greenwald–Khanna quantile
  * summary over a double column: the mergeable quantile layer the
  * non-mergeable `percentile_approx` result cannot provide. Rank error
  * ≤ relativeError·n, deterministic for a given input ORDER — build
  * layers over deterministic fine buckets (sort inside the bucket is the
  * scan order) or treat per-run byte differences as insignificant: the
  * QUERY answers are rank-bounded either way. */
case class QuantileSketchAgg(child: Expression, relativeError: Double,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      org.apache.spark.sql.catalyst.util.QuantileSummaries] {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double argument")

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold, relativeError)

  override def update(buffer: QuantileSummaries,
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else buffer.insert(v.asInstanceOf[Double])
  }

  override def merge(buffer: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any = {
    val c = buffer.compress()
    if (c.count == 0) null else QuantileCodec.write(c)
  }

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileCodec.write(buffer)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileCodec.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(child = newChildren.head)
}

/** `quantile_sketch_merge(sketch)` — union of serialized GK summaries
  * (rank errors add in the worst case; size layers' relativeError for
  * the post-merge bound you need). */
case class QuantileSketchMergeAgg(child: Expression,
                                  mutableAggBufferOffset: Int = 0,
                                  inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      org.apache.spark.sql.catalyst.util.QuantileSummaries] {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def prettyName: String = "quantile_sketch_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary (serialized quantile sketch) argument")

  override def createAggregationBuffer(): QuantileSummaries =
    new QuantileSummaries(
      QuantileSummaries.defaultCompressThreshold,
      QuantileSummaries.defaultRelativeError)

  override def update(buffer: QuantileSummaries,
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : QuantileSummaries = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = QuantileCodec.read(v.asInstanceOf[Array[Byte]])
      if (buffer.count == 0) in else buffer.compress().merge(in)
    }
  }

  override def merge(buffer: QuantileSummaries,
                     other: QuantileSummaries): QuantileSummaries =
    if (other.count == 0) buffer
    else if (buffer.count == 0) other
    else buffer.compress().merge(other.compress())

  override def eval(buffer: QuantileSummaries): Any =
    if (buffer.count == 0) null else QuantileCodec.write(buffer)

  override def serialize(buffer: QuantileSummaries): Array[Byte] =
    QuantileCodec.write(buffer)
  override def deserialize(bytes: Array[Byte]): QuantileSummaries =
    QuantileCodec.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(child = newChildren.head)
}

/** `quantile_sketch_query(sketch, q)` — the ε-approximate q-quantile
  * from a serialized GK summary (an actual data value whose rank is
  * within ε·n of ⌈q·n⌉). Caches the deserialized summary per partition
  * while the binary is reference-equal, like [[CmsEstimate]]. */
case class QuantileSketchQuery(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.catalyst.util.QuantileSummaries

  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "quantile_sketch_query"

  // Strict check — see [[CmsEstimate]]; quantile_sketch_query(s, 0.9)'s
  // DECIMAL literal coerces in the SQL registration builder
  // (GraftFunctions.widenToDouble), not via implicit casts that would
  // also let a string pose as the sketch.
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary sketch as its first argument")
    else if (right.dataType != org.apache.spark.sql.types.DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName quantile must be a double in [0, 1]")
    else TypeCheckResult.TypeCheckSuccess

  @transient private var cachedBytes: AnyRef = _
  @transient private var cachedQs: QuantileSummaries = _

  private def summaryFor(bytes: Array[Byte]): QuantileSummaries = {
    if (!(bytes.asInstanceOf[AnyRef] eq cachedBytes)) {
      cachedQs = QuantileCodec.read(bytes)
      cachedBytes = bytes
    }
    cachedQs
  }

  /** Shared by interpreted eval and generated code. Returns null when
    * the sketch is empty. */
  def queryQ(sketch: Array[Byte], q: Double): java.lang.Double =
    summaryFor(sketch).query(q) match {
      case scala.Some(v) => java.lang.Double.valueOf(v)
      case _ => null
    }

  protected override def nullSafeEval(sketch: Any, q: Any): Any = {
    val r = queryQ(sketch.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("qsQuery", this, classOf[QuantileSketchQuery].getName)
    nullSafeCodeGen(ctx, ev, (s, q) => {
      val tmp = ctx.freshName("qv")
      s"""
         |java.lang.Double $tmp = $ref.queryQ($s, $q);
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSketchQuery =
    copy(left = newLeft, right = newRight)
}

/** Column wrappers. */
object SketchExpressions {
  def cmsMerge(sketch: Column): Column =
    ColumnBridge.column(CmsMergeAgg(ColumnBridge.expression(sketch))
      .toAggregateExpression())
  // Column-API entries widen numeric args exactly like the SQL
  // registration builders (GraftFunctions.widenToLong/widenToDouble) —
  // an int32-keyed layer probes without an explicit cast, while the
  // sketch argument stays under the strict binary check.
  def cmsEstimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch),
      GraftFunctions.widenToLong(ColumnBridge.expression(item))))
  def quantileSketch(x: Column, relativeError: Double = 0.01): Column =
    ColumnBridge.column(
      QuantileSketchAgg(ColumnBridge.expression(x), relativeError)
        .toAggregateExpression())
  def quantileSketchMerge(sketch: Column): Column =
    ColumnBridge.column(
      QuantileSketchMergeAgg(ColumnBridge.expression(sketch))
        .toAggregateExpression())
  def quantileSketchQuery(sketch: Column, q: Column): Column =
    ColumnBridge.column(QuantileSketchQuery(
      ColumnBridge.expression(sketch),
      GraftFunctions.widenToDouble(ColumnBridge.expression(q))))
}
