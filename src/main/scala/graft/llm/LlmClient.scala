package graft.llm

import graft.dedup.Dedup

/** Pluggable LLM interface for the reference's LLM-dependent operators
  * (C8/C9 contradiction & pattern judges, K3 field compile, R5 HyDe —
  * SURVEY §7.4 risk 7: implement behind a trait with a deterministic stub;
  * parity scope is the deterministic paths).
  */
trait LlmClient {
  def complete(prompt: String): String
}

/** Deterministic stub: a canned, hash-tagged echo. Lets every LLM-adjacent
  * pipeline run end-to-end and reproducibly in tests without a model; swap
  * in a real client at deployment.
  */
object StubLlm extends LlmClient {
  def complete(prompt: String): String = {
    var acc = 0L
    prompt.foreach(c => acc = (acc * 31 + c.toLong) % Dedup.P)
    s"stub[$acc]: ${prompt.take(64)}"
  }
}
