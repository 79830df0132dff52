package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-agent workflow engine (reference:
  * src/services/ai/agentic_workflow.rs): agent registry with context
  * windows, tool-call and chain-of-thought recording with token
  * estimates and threshold-triggered context eviction, shared memory
  * with priority-based capacity eviction, sequential workflows with
  * typed steps, a capped replayable event log, and engine stats.
  *
  * Reference semantics reproduced exactly, including the quirks:
  * `advanceWorkflow`'s FIRST call completes step 0 (it never observes
  * Running), eviction drops the oldest third of the thought chain and
  * halves the used-context estimate, tool calls cost a flat 100
  * estimated tokens and thoughts `len/4`, shared-memory writes evict
  * the lowest-priority entry only when inserting a NEW key at capacity,
  * and the event log drops its oldest entry at `maxEvents`.
  *
  * This is driver-side orchestration state by nature (bounded by
  * maxAgents/maxWorkflows/maxSharedMemory/maxEvents — the config IS the
  * scale contract); the data-plane hook is [[AgentWorkflow.searchStep]],
  * which executes a `Search` step against a registered DataFrame corpus
  * through the engine's own embedder + top-k operator.
  */
object AgentWorkflow {

  sealed trait AgentStatus
  object AgentStatus {
    case object Idle extends AgentStatus
    case object Working extends AgentStatus
    case object Waiting extends AgentStatus
    case object Done extends AgentStatus
  }

  final case class ToolCall(tool: String, input: String,
                            output: Option[String], timestamp: Long,
                            durationMs: Long, success: Boolean)
  final case class ThoughtEntry(step: Int, thought: String,
                                action: Option[String],
                                observation: Option[String], timestamp: Long)
  final case class Agent(id: String, role: String, contextWindow: Int,
                         var contextUsed: Int, var status: AgentStatus,
                         registeredAt: Long,
                         toolCalls: mutable.Buffer[ToolCall],
                         thoughtChain: mutable.Buffer[ThoughtEntry])

  final case class SharedMemoryEntry(key: String, value: String,
                                     writtenBy: String, writtenAt: Long,
                                     var accessCount: Long,
                                     var priority: Int)

  sealed trait StepType
  object StepType {
    final case class Execute(prompt: String) extends StepType
    final case class Search(query: String, k: Int) extends StepType
    final case class Store(key: String, value: String) extends StepType
    final case class Condition(condition: String) extends StepType
    case object WaitForInput extends StepType
    final case class FanOut(agentIds: Seq[String]) extends StepType
  }

  sealed trait StepStatus
  object StepStatus {
    case object Pending extends StepStatus
    case object Running extends StepStatus
    case object Completed extends StepStatus
    case object Failed extends StepStatus
    case object Skipped extends StepStatus
  }

  final case class WorkflowStep(name: String, agentId: String,
                                stepType: StepType,
                                var status: StepStatus = StepStatus.Pending,
                                var output: Option[String] = None,
                                dependsOn: Seq[Int] = Nil)

  sealed trait WorkflowStatus
  object WorkflowStatus {
    case object Created extends WorkflowStatus
    case object Running extends WorkflowStatus
    case object Paused extends WorkflowStatus
    case object Completed extends WorkflowStatus
    case object Failed extends WorkflowStatus
  }

  final case class Workflow(id: String, name: String,
                            steps: Vector[WorkflowStep],
                            var currentStep: Int,
                            var status: WorkflowStatus, createdAt: Long,
                            var completedAt: Option[Long])

  final case class WorkflowEvent(eventType: String, agentId: Option[String],
                                 workflowId: Option[String], data: String,
                                 timestamp: Long)

  final case class WorkflowConfig(maxAgents: Int = 64,
                                  maxSharedMemory: Int = 10000,
                                  maxEvents: Int = 100000,
                                  defaultContextWindow: Int = 8192,
                                  contextEvictionThreshold: Double = 0.9,
                                  maxWorkflows: Int = 100)

  final case class EngineStats(var totalToolCalls: Long = 0,
                               var totalThoughts: Long = 0,
                               var totalMemoryWrites: Long = 0,
                               var totalMemoryReads: Long = 0,
                               var totalContextEvictions: Long = 0,
                               var activeAgents: Int = 0,
                               var activeWorkflows: Int = 0)

  final case class WorkflowError(message: String)
    extends RuntimeException(message)

  final class WorkflowEngine(val config: WorkflowConfig = WorkflowConfig(),
                             val now: () => Long =
                               () => System.currentTimeMillis() / 1000L) {
    private val agents = mutable.LinkedHashMap.empty[String, Agent]
    private val sharedMemory =
      mutable.LinkedHashMap.empty[String, SharedMemoryEntry]
    private val workflows = mutable.LinkedHashMap.empty[String, Workflow]
    private val eventLog = mutable.ArrayDeque.empty[WorkflowEvent]
    val stats: EngineStats = EngineStats()
    private var nextAgentId = 1L
    private var nextWorkflowId = 1L

    // ------------------------------------------------------------ agents

    def registerAgent(role: String, contextWindow: Int = 0): String =
      synchronized {
        // Deliberate divergence: the reference declares max_agents in
        // its config but never enforces it, so its register path never
        // throws for this reason. An unenforced cap is dead config;
        // here it is a real limit (same stance as
        // Transactions.begin's maxConcurrent).
        if (agents.size >= config.maxAgents)
          throw WorkflowError(s"Too many agents (max ${config.maxAgents})")
        val id = f"agent-$nextAgentId%04d"
        nextAgentId += 1
        val ctx = if (contextWindow == 0) config.defaultContextWindow
                  else contextWindow
        agents(id) = Agent(id, role, ctx, contextUsed = 0, AgentStatus.Idle,
          now(), mutable.Buffer.empty, mutable.Buffer.empty)
        stats.activeAgents += 1
        record("AgentRegistered", Some(id), None, s"""{"role":"$role"}""")
        id
      }

    def agent(id: String): Option[Agent] = synchronized(agents.get(id))
    def agentCount: Int = synchronized(agents.size)

    def setAgentStatus(id: String, status: AgentStatus): Unit =
      synchronized {
        val a = agents.getOrElse(id, throw WorkflowError(s"Agent '$id'"))
        a.status = status
        record("AgentStatusChange", Some(id), None,
          s"""{"status":"$status"}""")
      }

    def recordToolCall(agentId: String, tool: String, input: String,
                       output: Option[String], durationMs: Long,
                       success: Boolean): Unit = synchronized {
      val a = agents.getOrElse(agentId,
        throw WorkflowError(s"Agent '$agentId'"))
      a.toolCalls += ToolCall(tool, input, output, now(), durationMs, success)
      a.contextUsed += 100 // reference's flat token estimate
      stats.totalToolCalls += 1
      record("ToolCallEnd", Some(agentId), None,
        s"""{"tool":"$tool","success":$success}""")
      checkContextEviction(agentId)
    }

    def addThought(agentId: String, thought: String,
                   action: Option[String] = None,
                   observation: Option[String] = None): Unit = synchronized {
      val a = agents.getOrElse(agentId,
        throw WorkflowError(s"Agent '$agentId'"))
      val step = a.thoughtChain.size + 1
      a.thoughtChain += ThoughtEntry(step, thought, action, observation, now())
      a.contextUsed += thought.length / 4 // reference's rough estimate
      stats.totalThoughts += 1
      record("ThoughtAdded", Some(agentId), None, s"""{"step":$step}""")
      checkContextEviction(agentId)
    }

    /** agentic_workflow.rs:621-637: past the threshold, drop the oldest
      * third of the thought chain and halve the used-context estimate.
      */
    private def checkContextEviction(agentId: String): Unit =
      agents.get(agentId).foreach { a =>
        val threshold =
          (a.contextWindow * config.contextEvictionThreshold).toInt
        if (a.contextUsed > threshold) {
          val toRemove = a.thoughtChain.size / 3
          if (toRemove > 0) {
            a.thoughtChain.remove(0, toRemove)
            a.contextUsed = a.contextUsed / 2
            stats.totalContextEvictions += 1
          }
        }
      }

    // ----------------------------------------------------- shared memory

    def writeSharedMemory(agentId: String, key: String,
                          value: String): Unit = synchronized {
      if (!agents.contains(agentId))
        throw WorkflowError(s"Agent '$agentId'")
      if (sharedMemory.size >= config.maxSharedMemory &&
          !sharedMemory.contains(key)) {
        // evict the lowest-priority entry (reference ties: map order)
        sharedMemory.minByOption(_._2.priority)
          .foreach { case (k, _) => sharedMemory.remove(k) }
      }
      sharedMemory(key) =
        SharedMemoryEntry(key, value, agentId, now(), 0L, priority = 1)
      stats.totalMemoryWrites += 1
      record("MemoryWrite", Some(agentId), None, s"""{"key":"$key"}""")
    }

    def readSharedMemory(agentId: String, key: String): String =
      synchronized {
        if (!agents.contains(agentId))
          throw WorkflowError(s"Agent '$agentId'")
        val e = sharedMemory.getOrElse(key,
          throw WorkflowError(s"Memory key '$key'"))
        e.accessCount += 1
        stats.totalMemoryReads += 1
        record("MemoryRead", Some(agentId), None, s"""{"key":"$key"}""")
        e.value
      }

    def listSharedMemory: Seq[SharedMemoryEntry] =
      synchronized(sharedMemory.values.toSeq)

    def setMemoryPriority(key: String, priority: Int): Unit = synchronized {
      sharedMemory.getOrElse(key,
        throw WorkflowError(s"Memory key '$key'")).priority = priority
    }

    // --------------------------------------------------------- workflows

    def createWorkflow(name: String, steps: Seq[WorkflowStep]): String =
      synchronized {
        if (workflows.size >= config.maxWorkflows)
          throw WorkflowError(
            s"Maximum workflows (${config.maxWorkflows}) reached")
        val id = f"wf-$nextWorkflowId%04d"
        nextWorkflowId += 1
        workflows(id) = Workflow(id, name, steps.toVector, currentStep = 0,
          WorkflowStatus.Created, now(), completedAt = None)
        stats.activeWorkflows += 1
        record("WorkflowCreated", None, Some(id), s"""{"name":"$name"}""")
        id
      }

    /** agentic_workflow.rs:534-609 reproduced exactly, including the
      * quirk that the FIRST advance completes step 0 without it ever
      * observing Running.
      */
    def advanceWorkflow(workflowId: String): Option[WorkflowStep] =
      synchronized {
        val wf = workflows.getOrElse(workflowId,
          throw WorkflowError(s"Workflow '$workflowId'"))
        if (wf.status == WorkflowStatus.Completed ||
            wf.status == WorkflowStatus.Failed)
          throw WorkflowError(
            s"Workflow '$workflowId' is already ${wf.status}")
        wf.status = WorkflowStatus.Running
        val completedStep =
          if (wf.currentStep < wf.steps.length) {
            wf.steps(wf.currentStep).status = StepStatus.Completed
            val s = wf.currentStep
            wf.currentStep += 1
            Some(s)
          } else None
        completedStep.foreach(s =>
          record("StepCompleted", None, Some(workflowId), s"""{"step":$s}"""))
        if (wf.currentStep >= wf.steps.length) {
          wf.status = WorkflowStatus.Completed
          wf.completedAt = Some(now())
          stats.activeWorkflows = math.max(0, stats.activeWorkflows - 1)
          record("WorkflowCompleted", None, Some(workflowId), "{}")
          None
        } else {
          wf.steps(wf.currentStep).status = StepStatus.Running
          record("StepStarted", None, Some(workflowId),
            s"""{"step":${wf.currentStep}}""")
          Some(wf.steps(wf.currentStep))
        }
      }

    def workflow(id: String): Option[Workflow] = synchronized(workflows.get(id))
    def listWorkflows: Seq[Workflow] = synchronized(workflows.values.toSeq)

    // ----------------------------------------------------- observability

    private def record(eventType: String, agentId: Option[String],
                       workflowId: Option[String], data: String): Unit = {
      if (eventLog.size >= config.maxEvents) { eventLog.removeHead(); () }
      eventLog.append(WorkflowEvent(eventType, agentId, workflowId, data, now()))
      ()
    }

    def events: Seq[WorkflowEvent] = synchronized(eventLog.toSeq)
    def agentEvents(agentId: String): Seq[WorkflowEvent] =
      synchronized(eventLog.filter(_.agentId.contains(agentId)).toSeq)
    def workflowEvents(workflowId: String): Seq[WorkflowEvent] =
      synchronized(eventLog.filter(_.workflowId.contains(workflowId)).toSeq)
  }

  /** Data-plane bridge: execute a `Search` workflow step against a
    * DataFrame corpus with the engine's deterministic text embedder and
    * the declarative top-k — the part of the workflow that actually
    * scales with data lives on Spark, not in the orchestrator.
    */
  def searchStep(step: StepType.Search, corpus: DataFrame, vecCol: Column,
                 dims: Int, idCol: String = "id"): DataFrame = {
    val qv = graft.multimodal.Multimodal.mockEmbed(
      step.query.getBytes(java.nio.charset.StandardCharsets.UTF_8), dims)
    Search.topK(corpus, vecCol, lit(qv), step.k, metric = "cosine",
      idCol = idCol)
  }
}
