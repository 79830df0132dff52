package graft

import scala.collection.mutable

import graft.ops.AgentWorkflow._

/** Model-based property test for the agent engine's shared-memory
  * eviction and event-log ring (the TransactionsModelSpec pattern):
  * random write/overwrite/setPriority/read sequences at a tiny
  * `maxSharedMemory` replayed against a LinkedHashMap model with the
  * documented semantics — eviction removes the lowest-priority entry
  * (ties: insertion order) only when a NEW key arrives at capacity;
  * overwriting an existing key never evicts and RESETS its priority
  * to 1; reads bump accessCount and error on missing keys. The event
  * log must behave as a ring that drops its oldest entry at
  * `maxEvents`. These rules are documented at AgentWorkflow.scala:19-21
  * and were previously pinned by examples only.
  */
class AgentWorkflowModelSpec extends SparkSpec {

  private final case class MEntry(var value: String, var priority: Int,
                                  var accessCount: Long, seq: Int)

  test("200 random shared-memory ops match the eviction model; the " +
      "event log rings at maxEvents") {
    val rnd = new scala.util.Random(20260814)
    val maxMem = 5
    val maxEvents = 20
    val eng = new WorkflowEngine(
      WorkflowConfig(maxSharedMemory = maxMem, maxEvents = maxEvents),
      now = () => 1L)
    val agent = eng.registerAgent("writer")

    // model: insertion-ordered, like the engine's LinkedHashMap
    val model = mutable.LinkedHashMap.empty[String, MEntry]
    var seq = 0
    val modelEvents = mutable.ArrayDeque.empty[String] // eventType only
    def mRecord(t: String): Unit = {
      if (modelEvents.size >= maxEvents) { modelEvents.removeHead(); () }
      modelEvents.append(t); ()
    }
    mRecord("AgentRegistered")

    def mWrite(key: String, value: String): Unit = {
      if (model.size >= maxMem && !model.contains(key)) {
        // lowest priority, ties by insertion order (min is stable on
        // the ordered map)
        model.minByOption(_._2.priority)
          .foreach { case (k, _) => model.remove(k) }
      }
      seq += 1
      model(key) = MEntry(value, priority = 1, accessCount = 0L, seq)
      mRecord("MemoryWrite")
    }

    val keys = (0 until 9).map(i => s"k$i")
    var evictions = 0
    var overwritesAtCapacity = 0
    (1 to 200).foreach { _ =>
      rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 => // write (new or overwrite)
          val k = keys(rnd.nextInt(keys.size))
          val v = s"v${rnd.nextInt(100)}"
          if (model.size >= maxMem)
            if (model.contains(k)) overwritesAtCapacity += 1
            else evictions += 1
          eng.writeSharedMemory(agent, k, v)
          mWrite(k, v)
        case 4 | 5 => // bump a priority (existing or missing)
          val k = keys(rnd.nextInt(keys.size))
          val p = rnd.nextInt(5)
          if (model.contains(k)) {
            eng.setMemoryPriority(k, p)
            model(k).priority = p
          } else intercept[WorkflowError](eng.setMemoryPriority(k, p))
        case 6 | 7 => // read (existing or missing)
          val k = keys(rnd.nextInt(keys.size))
          if (model.contains(k)) {
            assert(eng.readSharedMemory(agent, k) == model(k).value)
            model(k).accessCount += 1
            mRecord("MemoryRead")
          } else intercept[WorkflowError](eng.readSharedMemory(agent, k))
        case _ => // a tool call rides the same event ring
          eng.recordToolCall(agent, "t", "in", None, 1L, success = true)
          mRecord("ToolCallEnd")
      }
      // full-state comparison every step: keys IN ORDER, value,
      // priority, accessCount
      val got = eng.listSharedMemory
        .map(e => (e.key, e.value, e.priority, e.accessCount))
      val want = model.toSeq
        .map { case (k, e) => (k, e.value, e.priority, e.accessCount) }
      assert(got == want, s"shared memory diverged")
      assert(eng.events.size == modelEvents.size)
      assert(eng.events.map(_.eventType) == modelEvents.toSeq)
    }
    // the sequence must have exercised both capacity paths
    assert(evictions >= 10, s"only $evictions evictions")
    assert(overwritesAtCapacity >= 10)
    assert(modelEvents.size == maxEvents) // the ring filled and rolled
  }
}
