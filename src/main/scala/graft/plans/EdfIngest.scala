package graft.plans

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** D5: the `graft_edf_ingest` SQL surface as a DEFERRED task plan.
  *
  * The TVF used to run the whole streaming drain as a side effect of
  * plan ANALYSIS (the table-function builder executes while the
  * statement resolves), so `EXPLAIN`, schema inspection, or any
  * re-analysis of a statement triggered an ingest run (review r16
  * ADVICE). The TVF now resolves to this LEAF node — analysis merely
  * places it, `EXPLAIN` prints it, and the drain runs when the query
  * EXECUTES (doExecute), exactly like any other scan.
  *
  * Semantics stay stored-procedure-like and are part of the contract:
  *   - each EXECUTION drains every landed-but-unprocessed EDF file under
  *     `watch` (Trigger.AvailableNow — the reference's one-shot task
  *     loop, processor.py:10-69) and appends it into `out`'s channel
  *     binaries + manifests via the replay-safe streaming sink;
  *   - the returned rows are the post-drain channel index
  *     (channels.json), ordered by (start, name);
  *   - `checkpoint` defaults to `<out>/_checkpoint` — the offsets live
  *     INSIDE the output directory unless pointed elsewhere. Re-running
  *     the statement with the same checkpoint ingests only newly landed
  *     files (idempotent re-run), so executing the plan twice — two
  *     actions on one Dataset included — is safe, merely redundant.
  *
  * The drain runs on a CHILD session (own catalog/registry, shared
  * SparkContext, confs copied): the micro-batch thread resolves its own
  * plans against a catalog, and sharing the invoking session's would
  * serialize every concurrent ingest behind one catalog monitor. Two
  * concurrent `graft_edf_ingest` calls on different dirs run
  * independently (asserted in SqlTvfSpec).
  */
case class EdfIngestPlan(watch: String, out: String, checkpoint: String,
                         output: Seq[Attribute]) extends LeafNode {
  // output rides in the constructor (the LocalRelation pattern): every
  // optimizer copy of this node must keep the SAME expression ids, or
  // references already resolved against them fail to bind at execution
  override def computeStats(): org.apache.spark.sql.catalyst.plans.logical.Statistics =
    org.apache.spark.sql.catalyst.plans.logical.Statistics(sizeInBytes = 1L)
}

object EdfIngestPlan {
  private[plans] val fields: Seq[(String, DataType)] = Seq(
    "name" -> StringType, "start" -> LongType, "end" -> LongType,
    "unit" -> StringType, "rate" -> DoubleType, "type" -> StringType)

  def apply(watch: String, out: String, checkpoint: String): EdfIngestPlan =
    EdfIngestPlan(watch, out, checkpoint,
      fields.map { case (n, dt) => AttributeReference(n, dt, nullable = true)() })
}

object EdfIngestStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: EdfIngestPlan => EdfIngestExec(p.output, p.watch, p.out, p.checkpoint) :: Nil
    case _ => Nil
  }
}

case class EdfIngestExec(output: Seq[Attribute], watch: String, out: String,
                         checkpoint: String) extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    val child = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      scala.util.Try(child.conf.set(k, v)): Unit
    }
    graft.EdfPipeline.processStream(child, Seq(watch), out, checkpoint).awaitTermination()

    // the post-drain channel index, parsed driver-side (channel-
    // cardinality JSON, not sample volume) and ordered by (start, name)
    val idx = new org.apache.hadoop.fs.Path(out, "channels.json")
    val fs = idx.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows: Seq[InternalRow] =
      if (!fs.exists(idx)) Seq.empty
      else {
        val in = fs.open(idx)
        val tree = try new ObjectMapper().readTree(in: java.io.InputStream) finally in.close()
        import scala.jdk.CollectionConverters._
        tree.elements().asScala.map { ch =>
          def str(f: String): UTF8String =
            if (ch.hasNonNull(f)) UTF8String.fromString(ch.get(f).asText()) else null
          def lng(f: String): Any = if (ch.hasNonNull(f)) Long.box(ch.get(f).asLong()) else null
          InternalRow(str("name"), lng("start"), lng("end"), str("unit"),
            if (ch.hasNonNull("rate")) Double.box(ch.get("rate").asDouble()) else null,
            str("type"))
        }.toSeq.sortBy(r => (
          if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
          if (r.isNullAt(0)) "" else r.getUTF8String(0).toString))
      }
    val proj = UnsafeProjection.create(output.map(_.dataType).toArray)
    sparkContext.parallelize(rows.map(r => proj(r).copy(): InternalRow), 1)
  }
}
