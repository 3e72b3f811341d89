package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cut for per-round ITERATIVE state (CC label frames, BFS
  * frontiers) — the deployment-dependent half of the iterative operators'
  * contract (SCALE.md "Iterative checkpointing at 100 TB").
  *
  * Default (no conf): eager `localCheckpoint` — blocks in executor-local
  * store, per-round floor at the scheduler minimum. Correct wherever an
  * executor loss is impossible (local[·]) or a loop restart is cheap.
  *
  * With `spark.graft.checkpointDir` set (100 TB clusters: an object-store
  * path), the state checkpoints RELIABLY instead: each round pays one
  * write+read of the per-vertex frame (|V| × ~16 B), and losing an
  * executor mid-loop costs one task retry rather than restarting a
  * 20-round job from round 0. localCheckpoint blocks carry NO fault
  * tolerance — their lineage is severed by construction — and they also
  * pin executors against dynamic-allocation shrink; neither is acceptable
  * on a 1000-executor loop.
  *
  * The operators decide WHICH frames are per-round state; this helper
  * owns only the mechanism, keyed off the session conf so a deployment
  * flips it without touching operator code. Retention stays O(1) either
  * way: only the latest round's frame is referenced (the round cap —
  * `maxIter`/`maxDepth` — bounds worst-case accumulation; see SCALE.md
  * for the object-store TTL note). Reliable checkpoint FILES are
  * reclaimed intra-job by the ContextCleaner
  * (`spark.cleaner.referenceTracking.cleanCheckpoints=true`,
  * set by [[graft.Engine.configure]]) once a round's frame is dropped
  * and GC'd; sessions built outside Engine.configure must set that conf
  * before the context starts, or rely on the object-store TTL.
  */
object Checkpointing {

  val confKey = "spark.graft.checkpointDir"

  // last conf value this helper pointed the context at — getCheckpointDir
  // returns Spark's resolved UUID subdir, so it can't be compared to the
  // conf string directly; re-pointing on every cut would mint a fresh
  // subdir per round
  private val pointedAt = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** True when `df` is already cheap to evaluate twice — a bare source
    * scan (possibly under projection/filter/alias) or an
    * already-checkpointed/cached frame. Operators whose plan reads an
    * input twice use this to decide whether materializing it buys
    * anything: for a persisted 100 TB state TABLE, re-scanning parquet
    * twice is far cheaper than copying the whole state into executor
    * block storage (ADVICE r8 on incrementalMinhash); only a LIVE
    * computation (joins/aggregates upstream) is worth checkpointing. */
  def isCheapRescan(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
    def ok(p: LogicalPlan): Boolean = p match {
      case p: Project       =>
        // only COLUMN-SHUFFLING projections are cheap to re-run; a
        // projection computing real work (e.g. a 64-perm minhash kernel)
        // would pay that work once per scan — checkpoint those
        p.projectList.forall {
          case _: AttributeReference => true
          case a: Alias => a.child.isInstanceOf[AttributeReference] ||
            a.child.isInstanceOf[Literal]
          case _ => false
        } && ok(p.child)
      case f: Filter        => ok(f.child)
      case a: SubqueryAlias => ok(a.child)
      case leaf: LeafNode   =>
        // every leaf is a source: file relations (v1 + DSv2), local data,
        // checkpointed RDD frames (LogicalRDD), cached views
        leaf.getClass.getSimpleName match {
          case "LogicalRelation" | "DataSourceV2Relation"
             | "DataSourceV2ScanRelation" | "LogicalRDD" | "LocalRelation"
             | "InMemoryRelation" => true
          case _ => false
        }
      case _ => false
    }
    ok(df.queryExecution.analyzed)
  }

  /** Cut lineage on `df`, eagerly: reliable checkpoint when [[confKey]]
    * is set, executor-local otherwise. */
  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(confKey) match {
      case Some(dir) if dir.nonEmpty =>
        if (pointedAt.getAndSet(dir) != dir || s.sparkContext.getCheckpointDir.isEmpty)
          s.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
