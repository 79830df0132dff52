package graft

import org.apache.spark.sql.functions._

import graft.ops.AgentWorkflow._
import graft.ops.AgentWorkflow.StepType._

/** Workflow engine vs agentic_workflow.rs: agent lifecycle, token
  * estimates + context eviction, shared-memory priority eviction,
  * workflow advance (including the first-advance quirk), capped event
  * log, stats, and the Spark-backed Search step bridge.
  */
class AgentWorkflowSpec extends SparkSpec {
  import spark.implicits._

  test("agent registry: sequential ids, default window, status events") {
    val e = new WorkflowEngine(now = () => 5L)
    val a1 = e.registerAgent("researcher")
    val a2 = e.registerAgent("writer", contextWindow = 1024)
    assert(a1 == "agent-0001" && a2 == "agent-0002")
    assert(e.agent(a1).get.contextWindow == 8192) // default
    assert(e.agent(a2).get.contextWindow == 1024)
    e.setAgentStatus(a1, AgentStatus.Working)
    assert(e.agent(a1).get.status == AgentStatus.Working)
    assert(e.stats.activeAgents == 2 && e.agentCount == 2)
    intercept[WorkflowError](e.setAgentStatus("ghost", AgentStatus.Idle))
  }

  test("tool calls and thoughts charge the reference token estimates; " +
      "eviction drops the oldest third and halves the estimate") {
    val e = new WorkflowEngine(now = () => 5L)
    val a = e.registerAgent("r", contextWindow = 1000) // threshold 900
    e.recordToolCall(a, "search", """{"q":1}""", None, 10L, success = true)
    assert(e.agent(a).get.contextUsed == 100)
    // 9 thoughts of 400 chars = 100 tokens each: used = 100 + 9·100 =
    // 1000 > 900 exactly at thought 9 → ONE eviction, dropping the
    // oldest 9/3 = 3 thoughts and halving the estimate
    (1 to 9).foreach(i => e.addThought(a, "x" * 400, Some(s"act$i")))
    val ag = e.agent(a).get
    assert(e.stats.totalContextEvictions == 1)
    assert(ag.thoughtChain.size == 6) // 9 - 9/3
    assert(ag.thoughtChain.head.step == 4) // oldest third dropped
    assert(ag.contextUsed == (100 + 9 * 100) / 2)
    assert(e.stats.totalToolCalls == 1 && e.stats.totalThoughts == 9)
  }

  test("shared memory: priority eviction only on NEW keys at capacity; " +
      "reads count accesses") {
    val e = new WorkflowEngine(WorkflowConfig(maxSharedMemory = 2),
      now = () => 5L)
    val a = e.registerAgent("r")
    e.writeSharedMemory(a, "k1", "v1")
    e.writeSharedMemory(a, "k2", "v2")
    e.setMemoryPriority("k2", 9)
    // overwrite at capacity: existing key does NOT evict
    e.writeSharedMemory(a, "k1", "v1b")
    assert(e.listSharedMemory.map(_.key).toSet == Set("k1", "k2"))
    // new key at capacity evicts the lowest priority (k1, priority 1)
    e.writeSharedMemory(a, "k3", "v3")
    assert(e.listSharedMemory.map(_.key).toSet == Set("k2", "k3"))
    assert(e.readSharedMemory(a, "k2") == "v2")
    assert(e.readSharedMemory(a, "k2") == "v2")
    assert(e.listSharedMemory.find(_.key == "k2").get.accessCount == 2)
    assert(e.stats.totalMemoryReads == 2 && e.stats.totalMemoryWrites == 4)
    intercept[WorkflowError](e.readSharedMemory(a, "nope"))
  }

  test("workflow advance: first call completes step 0, completion " +
      "decrements active count, finished workflows refuse") {
    val e = new WorkflowEngine(now = () => 5L)
    val a = e.registerAgent("r")
    val wf = e.createWorkflow("pipeline", Seq(
      WorkflowStep("plan", a, Execute("make a plan")),
      WorkflowStep("recall", a, Search("spark joins", 3)),
      WorkflowStep("save", a, Store("result", "done"))))
    assert(wf == "wf-0001")
    assert(e.workflow(wf).get.status == WorkflowStatus.Created)
    // first advance: step 0 completes, step 1 starts
    val s1 = e.advanceWorkflow(wf)
    assert(s1.get.name == "recall" && s1.get.status == StepStatus.Running)
    assert(e.workflow(wf).get.steps(0).status == StepStatus.Completed)
    val s2 = e.advanceWorkflow(wf)
    assert(s2.get.name == "save")
    assert(e.advanceWorkflow(wf).isEmpty) // finished
    val w = e.workflow(wf).get
    assert(w.status == WorkflowStatus.Completed &&
      w.completedAt.contains(5L))
    assert(e.stats.activeWorkflows == 0)
    intercept[WorkflowError](e.advanceWorkflow(wf))
    // event trail for the workflow
    assert(e.workflowEvents(wf).map(_.eventType) == Seq(
      "WorkflowCreated", "StepCompleted", "StepStarted", "StepCompleted",
      "StepStarted", "StepCompleted", "WorkflowCompleted"))
  }

  test("caps: max agents and max workflows refuse, event log drops its " +
      "oldest entry") {
    val e = new WorkflowEngine(
      WorkflowConfig(maxAgents = 1, maxWorkflows = 1, maxEvents = 3),
      now = () => 5L)
    val a = e.registerAgent("r")
    intercept[WorkflowError](e.registerAgent("overflow"))
    e.createWorkflow("one", Seq(WorkflowStep("s", a, WaitForInput)))
    intercept[WorkflowError](e.createWorkflow("two", Nil))
    (1 to 5).foreach(i => e.addThought(a, s"t$i"))
    val evs = e.events
    assert(evs.size == 3)
    assert(evs.forall(_.eventType == "ThoughtAdded")) // older types rolled off
  }

  test("Search steps execute against a DataFrame corpus through the " +
      "engine embedder — exact text lands at distance 0") {
    val dims = 16
    val texts = Seq("spark joins are fast", "flink streams", "duck db")
    val corpus = texts.zipWithIndex.map { case (t, i) =>
      (s"d$i", graft.multimodal.Multimodal.mockEmbed(
        t.getBytes("UTF-8"), dims).toSeq)
    }.toDF("id", "vector")
    val hits = searchStep(Search("spark joins are fast", 2), corpus,
      col("vector"), dims).collect()
    assert(hits.head.getAs[String]("id") == "d0")
    assert(hits.head.getAs[Double]("distance") < 1e-6)
    assert(hits.length == 2)
  }
}
