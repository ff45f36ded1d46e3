package graft.operators

import scala.reflect.ClassTag
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** A UDF raised on a specific input. Mirrors the reference's error
  * attribution contract — the original exception is re-raised client-side
  * with `exc.burla_input_index` set (reference: client/src/burla/_node.py:
  * 638-663, worker emit node_service/src/node_service/worker_server.py:
  * 170-180). Here the cause is the user exception and `inputIndex` is the
  * 0-based position in the submitted inputs.
  */
final case class UdfFailure(inputIndex: Long, cause: Throwable)
    extends RuntimeException(
      s"UDF raised on input $inputIndex: ${cause.getClass.getSimpleName}: ${cause.getMessage}",
      cause
    )

/** Envelope guards, mirroring the reference's hard limits: a pickled
  * function is capped at 0.1 GB (client/src/burla/_remote_parallel_map.py:
  * 220-224, `FunctionTooBig`) and a single pickled input at 200 MB
  * (client/src/burla/_node.py:25, `InputTooBig`). Sizes here are
  * SizeEstimator estimates of the in-memory object graph — the same
  * order of magnitude as serialized size for blob-like payloads.
  */
final case class FunctionTooBig(estimatedBytes: Long, limitBytes: Long)
    extends RuntimeException(
      f"function closure ~ ${estimatedBytes / 1e9}%.2f GB exceeds the ${limitBytes / 1e9}%.1f GB cap"
    )
final case class InputTooBig(inputIndex: Long, estimatedBytes: Long, limitBytes: Long)
    extends RuntimeException(
      f"input $inputIndex ~ ${estimatedBytes / 1e6}%.0f MB exceeds the ${limitBytes / 1e6}%.0f MB cap"
    )

/** Spark-native rebuild of the reference's one dataflow operator,
  * `remote_parallel_map(f, inputs)` (reference: client/src/burla/
  * _remote_parallel_map.py:457-537).
  *
  * Semantics carried over (SURVEY.md §2.1, §2.4):
  *   - results are unordered (docstring :518-521) — we return them as
  *     completed partitions arrive, not input order;
  *   - `[] => []` without touching the cluster (:542-543);
  *   - tuple-unpack calling convention (:553-556) is native in Scala —
  *     pass `{ case (a, b) => ... }`;
  *   - first UDF exception re-raised with input attribution (UdfFailure);
  *   - `generator=True` => `stream(...)`: a lazy iterator with
  *     one-partition-at-a-time backpressure (toLocalIterator), the analog
  *     of the reference's 50%-RAM result-queue backpressure
  *     (node_service worker_client.py:28,792-793);
  *   - `max_parallelism` => explicit partition count.
  *
  * What Spark absorbs rather than re-implements (SURVEY.md §2.2-2.3): work
  * stealing (P7) is the task scheduler; chunking (P2) is partition
  * planning; retries/heartbeats/ACKs are the Spark RPC + task-retry layer;
  * adaptive RAM (E6) is JVM-managed unified memory. Nested rpm-from-UDF
  * (L4) is not expressible from executors — compose on the driver.
  *
  * Inputs/outputs are opaque to the engine (the reference moves pickled
  * blobs; SURVEY.md §1.2), so encoders are Kryo — schema-free by design.
  * For schema-ful pipelines use the DataFrame surface instead.
  */
object ParallelMap {

  private def kryoPair[T: ClassTag]: Encoder[(Long, T)] =
    Encoders.kryo[(Long, T)]

  /** Reference envelope: 0.1 GB function, 200 MB per input (SURVEY §1.2). */
  val MaxFunctionBytes: Long = 100L * 1000 * 1000
  val MaxInputBytes: Long = 200L * 1000 * 1000
  private val SizeCheckSample = 10000

  private def guardSizes[I, O](inputs: Seq[I], f: I => O): Unit = {
    import org.apache.spark.util.SizeEstimator
    val fSize = SizeEstimator.estimate(f)
    if (fSize > MaxFunctionBytes) throw FunctionTooBig(fSize, MaxFunctionBytes)
    // full scan for modest lists (the reference checks every chunk it
    // packs); sample evenly beyond that to keep submission O(1)-ish
    val idxs =
      if (inputs.size <= SizeCheckSample) inputs.indices
      else inputs.indices by (inputs.size / SizeCheckSample)
    idxs.foreach { i =>
      val s = SizeEstimator.estimate(inputs(i).asInstanceOf[AnyRef])
      if (s > MaxInputBytes) throw InputTooBig(i.toLong, s, MaxInputBytes)
    }
  }

  /** Build the indexed, error-attributed dataset backing both modes. */
  private def plan[I: ClassTag, O: ClassTag](
      spark: SparkSession,
      inputs: Seq[I],
      f: I => O,
      maxParallelism: Option[Int]
  ): Dataset[(Long, O)] = {
    val defaultPar = spark.sparkContext.defaultParallelism
    val slices = maxParallelism.getOrElse(math.min(defaultPar, math.max(1, inputs.size)))
    val indexed: Seq[(Long, I)] = inputs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
    val ds = spark.createDataset(indexed)(kryoPair[I]).repartition(slices)
    ds.map { case (idx, x) =>
      try (idx, f(x))
      catch { case e: Throwable => throw UdfFailure(idx, e) }
    }(kryoPair[O])
  }

  /** Walk a Spark-wrapped failure back to the attributed UDF error. */
  private def unwrap(e: Throwable): Throwable = {
    var cur: Throwable = e
    while (cur != null) {
      cur match {
        case u: UdfFailure => return u
        case _             => cur = cur.getCause
      }
    }
    e
  }

  /** List mode: apply f to every input in parallel, return all results
    * (unordered). Throws UdfFailure(inputIndex, cause) on first UDF error.
    */
  def run[I: ClassTag, O: ClassTag](
      spark: SparkSession,
      inputs: Seq[I],
      maxParallelism: Option[Int] = None
  )(f: I => O): Seq[O] = {
    if (inputs.isEmpty) return Nil // empty short-circuit, no cluster contact
    guardSizes(inputs, f)
    try plan(spark, inputs, f, maxParallelism).collect().toSeq.map(_._2)
    catch { case e: Throwable => throw unwrap(e) }
  }

  /** Like run but keeps the input index with each result and never throws:
    * per-input success/failure, the reference's (idx, is_error, payload)
    * result triple (node_service job_endpoints.py:638).
    */
  def runAttributed[I: ClassTag, O: ClassTag](
      spark: SparkSession,
      inputs: Seq[I],
      maxParallelism: Option[Int] = None
  )(f: I => O): Seq[(Long, Try[O])] = {
    if (inputs.isEmpty) return Nil
    guardSizes(inputs, f)
    val indexed = inputs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
    val slices = maxParallelism.getOrElse(
      math.min(spark.sparkContext.defaultParallelism, math.max(1, inputs.size))
    )
    implicit val enc: Encoder[(Long, Either[String, O])] =
      Encoders.kryo[(Long, Either[String, O])]
    spark
      .createDataset(indexed)(kryoPair[I])
      .repartition(slices)
      .map { case (idx, x) =>
        val r: Either[String, O] =
          try Right(f(x))
          catch { case e: Throwable => Left(s"${e.getClass.getName}: ${e.getMessage}") }
        (idx, r)
      }
      .collect()
      .toSeq
      .map {
        case (i, Right(v))  => (i, Success(v))
        case (i, Left(msg)) => (i, Failure(new RuntimeException(msg)))
      }
  }

  /** Per-input log capture cap, mirroring the reference's 100 KB/doc limit
    * (node_service worker_client.py:32; SURVEY §1.1 "Log document"). */
  val MaxLogBytesPerInput: Int = 100 * 1000

  /** Like runAttributed, but also captures what the UDF printed while
    * processing each input — the reference's per-input log attribution
    * (worker_client.py:154-338 parses `__burla_input_start__:idx` markers
    * out of container logs; here the capture is direct). Scala
    * `println`/`Console.out` writes are captured per task thread
    * (Console.withOut is thread-local); raw `System.out` writes from
    * native/Java code bypass the capture and land in executor logs.
    * Output is truncated at MaxLogBytesPerInput per input.
    */
  def runWithLogs[I: ClassTag, O: ClassTag](
      spark: SparkSession,
      inputs: Seq[I],
      maxParallelism: Option[Int] = None
  )(f: I => O): Seq[(Long, Try[O], String)] = {
    if (inputs.isEmpty) return Nil
    guardSizes(inputs, f)
    val indexed = inputs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
    val slices = maxParallelism.getOrElse(
      math.min(spark.sparkContext.defaultParallelism, math.max(1, inputs.size))
    )
    implicit val enc: Encoder[(Long, Either[String, O], String)] =
      Encoders.kryo[(Long, Either[String, O], String)]
    val cap = MaxLogBytesPerInput
    spark
      .createDataset(indexed)(kryoPair[I])
      .repartition(slices)
      .map { case (idx, x) =>
        val buf = new java.io.ByteArrayOutputStream()
        val r: Either[String, O] =
          try Right(Console.withOut(buf)(f(x)))
          catch { case e: Throwable => Left(s"${e.getClass.getName}: ${e.getMessage}") }
        // cap is BYTES: truncate the raw buffer before decoding, so
        // multi-byte output cannot exceed the documented 100 KB limit
        // (a chopped trailing codepoint decodes as U+FFFD, which is fine)
        val bytes = buf.toByteArray
        val logs = new String(bytes, 0, math.min(bytes.length, cap), "UTF-8")
        (idx, r, logs)
      }
      .collect()
      .toSeq
      .map {
        case (i, Right(v), lg)  => (i, Success(v), lg)
        case (i, Left(msg), lg) => (i, Failure(new RuntimeException(msg)), lg)
      }
  }

  /** Generator mode (`generator=True`): lazy unordered stream with
    * driver-side backpressure — partitions are fetched one at a time.
    */
  def stream[I: ClassTag, O: ClassTag](
      spark: SparkSession,
      inputs: Seq[I],
      maxParallelism: Option[Int] = None
  )(f: I => O): Iterator[O] = {
    if (inputs.isEmpty) return Iterator.empty
    guardSizes(inputs, f)
    val it = plan(spark, inputs, f, maxParallelism).toLocalIterator()
    // toLocalIterator prefetches the next partition inside hasNext, so the
    // attributed failure can surface from either call — unwrap both.
    new Iterator[O] {
      def hasNext: Boolean =
        try it.hasNext
        catch { case e: Throwable => throw unwrap(e) }
      def next(): O =
        try it.next()._2
        catch { case e: Throwable => throw unwrap(e) }
    }
  }

  /** Dataset-side variant for schema-ful pipelines: same wrapper semantics,
    * but distributed end-to-end (no driver materialization of inputs).
    */
  def mapDataset[I, O: Encoder](ds: Dataset[I])(f: I => O): Dataset[O] =
    ds.map(f)

  /** Handle on a detached job: the reference's `detach=True` (job keeps
    * running independently of the submitting code path,
    * _remote_parallel_map.py:217-218) plus its three cancellation paths
    * (Ctrl-C / dashboard stop / cluster restart — SURVEY.md §2.4 D6-D7),
    * which all collapse to one mechanism here: cancelling the job group.
    */
  final class PMapJob[O] private[operators] (
      spark: SparkSession,
      val jobGroup: String,
      fut: java.util.concurrent.CompletableFuture[Seq[O]],
      cancelled: java.util.concurrent.atomic.AtomicBoolean
  ) {
    def isCompleted: Boolean = fut.isDone

    /** Block for the results (re-raising an attributed UdfFailure; infra
      * failures — e.g. cancellation — surface as their Spark cause). */
    def result(): Seq[O] =
      try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw unwrap(if (e.getCause != null) e.getCause else e)
      }

    /** Cancel this map. Sticky: a cancel that lands before the Spark job
      * is submitted still cancels (the reference fails a job canceled
      * before upload completes — endpoints semantics of D7). Idempotent. */
    def cancel(): Unit = {
      cancelled.set(true)
      spark.sparkContext.cancelJobGroup(jobGroup)
      fut.completeExceptionally(
        new java.util.concurrent.CancellationException(s"$jobGroup canceled")
      )
    }
  }

  /** Detached mode: submit and return immediately; the job runs to
    * completion (or cancellation) regardless of what the caller does next.
    */
  def runDetached[I: ClassTag, O: ClassTag](
      spark: SparkSession,
      inputs: Seq[I],
      maxParallelism: Option[Int] = None
  )(f: I => O): PMapJob[O] = {
    val group = s"pmap-${java.util.UUID.randomUUID()}"
    val fut = new java.util.concurrent.CompletableFuture[Seq[O]]()
    val cancelled = new java.util.concurrent.atomic.AtomicBoolean(false)
    if (inputs.isEmpty) { fut.complete(Nil); return new PMapJob(spark, group, fut, cancelled) }
    guardSizes(inputs, f) // fail fast on the submitting thread, as the reference does
    val t = new Thread(() => {
      try {
        // job group is thread-local; tag every job this map spawns
        spark.sparkContext.setJobGroup(group, s"ParallelMap detached ($group)",
          interruptOnCancel = true)
        if (!cancelled.get()) {
          val r = plan(spark, inputs, f, maxParallelism).collect().toSeq.map(_._2)
          // a cancel that raced the submission wins: results are discarded
          // (completeExceptionally in cancel() seals the future first)
          fut.complete(r)
        }
      } catch { case e: Throwable => fut.completeExceptionally(unwrap(e)) }
      finally spark.sparkContext.clearJobGroup()
    }, group)
    t.setDaemon(true)
    t.start()
    new PMapJob(spark, group, fut, cancelled)
  }
}
