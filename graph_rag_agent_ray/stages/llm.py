"""Chat-model client layer for the production extractor.

The reference drives an OpenAI-compatible chat model through LangChain
(/root/reference/graph/extraction/entity_extractor.py:48-59; model factory
model/get_models.py:30-38). This module provides the same seam without the
framework: a minimal ``ChatClient`` protocol plus three implementations —

- ``OpenAIChatClient``: the real network client (import-gated; this sandbox
  has no network, so construction raises unless the ``openai`` package and
  endpoint env vars exist).
- ``ReplayClient``: an offline RECORDED-COMPLETIONS fixture — a mapping of
  prompt keys to a sequence of scripted outcomes (text, or an error to
  raise). Lets tests exercise the full retry/backoff/malformed-output
  surface of the production code path with zero network.
- ``GrammarClient``: computes completions from the deterministic synthetic
  grammar (what the mock extractor knows), with an optional failure script —
  the full-pipeline stand-in when pre-recording every chunk is impractical.

Retry semantics mirror the reference's ``@retry(times=3, delay=1.0)``
(graph/core/utils.py:77-102) + its error-sentinel contract: a chunk whose
calls exhaust retries yields an EMPTY completion, never an exception
(graph_writer.py:111-121 — parse errors produce empty graph docs).
"""

from __future__ import annotations

import hashlib
import time
from typing import Callable, Dict, List, Optional

Message = Dict[str, str]  # {"role": ..., "content": ...}


class TransientAPIError(RuntimeError):
    """Retryable model-API failure (rate limit, timeout, 5xx)."""


def prompt_key(messages: List[Message]) -> str:
    """Stable key for a prompt (used by ReplayClient recordings)."""
    h = hashlib.sha1()
    for m in messages:
        h.update(m["role"].encode())
        h.update(b"\x00")
        h.update(m["content"].encode())
        h.update(b"\x01")
    return h.hexdigest()


class ReplayClient:
    """Offline recorded-completions client.

    ``recordings`` maps a key (either the full ``prompt_key`` or a caller-
    chosen logical key extracted by ``key_fn``) to a LIST of outcomes
    consumed in order; each outcome is a completion string or an Exception
    instance to raise (simulating API failures). The last outcome repeats
    once the list is exhausted. Unknown prompts raise KeyError — a replay
    gap is a test bug, not a silent empty completion."""

    def __init__(self, recordings: Dict[str, List],
                 key_fn: Optional[Callable[[List[Message]], str]] = None):
        self._rec = {k: list(v) for k, v in recordings.items()}
        self._key_fn = key_fn or prompt_key
        self.calls: List[str] = []

    def complete(self, messages: List[Message]) -> str:
        key = self._key_fn(messages)
        self.calls.append(key)
        outcomes = self._rec[key]
        outcome = outcomes.pop(0) if len(outcomes) > 1 else outcomes[0]
        if isinstance(outcome, Exception):
            raise outcome
        return outcome


class GrammarClient:
    """Deterministic 'model' that actually understands the synthetic corpus
    grammar (it reuses MockLLMExtractor's recognizer), plus an optional
    failure script: ``fail_every`` injects one TransientAPIError before every
    N-th successful completion, exercising the retry ladder end-to-end in a
    full build."""

    def __init__(self, cfg=None, fail_every: int = 0):
        from .extract import MockLLMExtractor
        self._inner = MockLLMExtractor(cfg)
        self._fail_every = fail_every
        self._n = 0
        self._failed_for: set = set()

    def complete(self, messages: List[Message]) -> str:
        text = messages[-1]["content"]
        self._n += 1
        if self._fail_every and self._n % self._fail_every == 0:
            key = hashlib.sha1(text.encode()).hexdigest()
            if key not in self._failed_for:  # fail once per prompt, then heal
                self._failed_for.add(key)
                raise TransientAPIError("scripted transient failure")
        # the grammar recognizer only sees the input text section
        return self._inner.extract_one(_input_text_of(messages))


def _input_text_of(messages: List[Message]) -> str:
    """Pull the raw input text back out of the human prompt (between the
    sentinel markers the prompt builder emits)."""
    content = messages[-1]["content"]
    lo = content.find(INPUT_TEXT_BEGIN)
    hi = content.rfind(INPUT_TEXT_END)
    if lo < 0 or hi < 0:
        return content
    return content[lo + len(INPUT_TEXT_BEGIN):hi]


INPUT_TEXT_BEGIN = "\n<<<TEXT>>>\n"
INPUT_TEXT_END = "\n<<<END TEXT>>>\n"


class DigestSummaryClient:
    """Offline 'model' for the community-summary stage (the GrammarClient
    analog for ModelSummarizer): parses the ``Nodes are: …. Relationships
    are: ….`` digest the summarizer sends as its human message
    (community/summary/base.py:16-45 format) and emits a deterministic
    abstractive-looking summary. Optional ``fail_every`` scripts one
    TransientAPIError before every N-th prompt (first attempt only) to
    exercise the retry ladder in a full build."""

    def __init__(self, fail_every: int = 0):
        self._fail_every = fail_every
        self._n = 0
        self._failed_for: set = set()

    def complete(self, messages: List[Message]) -> str:
        info = messages[-1]["content"]
        self._n += 1
        if self._fail_every and self._n % self._fail_every == 0:
            key = hashlib.sha1(info.encode()).hexdigest()
            if key not in self._failed_for:
                self._failed_for.add(key)
                raise TransientAPIError("scripted transient failure")
        nodes, rels = [], []
        lo = info.find("Nodes are: ")
        hi = info.find(". Relationships are: ")
        if lo >= 0 and hi > lo:
            nodes = [n for n in info[lo + 11:hi].split("; ") if n]
            tail = info[hi + 21:].rstrip(".")
            rels = [r for r in tail.split("; ") if r]
        head = ", ".join(nodes[:5])
        return (f"This community groups {len(nodes)} entities "
                f"(including {head}) connected by {len(rels)} relationships.")


def call_with_retry(client, messages: List[Message], retries: int = 3,
                    backoff_s: float = 1.0, sleep=time.sleep) -> str:
    """Reference retry ladder (graph/core/utils.py:77-102): ``retries``
    attempts with linear backoff; exhaustion returns the EMPTY completion
    (error sentinel — downstream parse emits an empty graph document for the
    chunk instead of failing the job, graph_writer.py:111-121)."""
    for attempt in range(retries):
        try:
            return client.complete(messages)
        except Exception:  # noqa: BLE001 — any API error is retryable here
            if attempt < retries - 1 and backoff_s:
                sleep(backoff_s * (attempt + 1))
    return ""


class OpenAIChatClient:
    """Real OpenAI-compatible endpoint (gated on the ``openai`` package and
    OPENAI_API_KEY / OPENAI_BASE_URL env). Absent in this sandbox."""

    def __init__(self, model: str = "gpt-4o-mini", temperature: float = 0.0):
        import os
        try:
            from openai import OpenAI  # type: ignore
        except ImportError as e:  # pragma: no cover - no network sandbox
            raise NotImplementedError(
                "the 'openai' package is not installed; use ReplayClient/"
                "GrammarClient offline") from e
        if not os.environ.get("OPENAI_API_KEY"):  # pragma: no cover
            raise NotImplementedError("OPENAI_API_KEY not set")
        self._client = OpenAI(base_url=os.environ.get("OPENAI_BASE_URL"))
        self._model = model
        self._temperature = temperature

    def complete(self, messages: List[Message]) -> str:  # pragma: no cover
        resp = self._client.chat.completions.create(
            model=self._model, messages=messages,
            temperature=self._temperature)
        return resp.choices[0].message.content or ""


class GlobalPointsClient:
    """Offline 'model' for the global-search map-reduce path
    (pipelines/query.global_search_mapreduce): map calls yield a
    deterministic points digest of the community data table; the reduce
    call (recognized by the 分析报告 header) folds the tagged points rows.
    Optional ``fail_first`` raises one TransientAPIError on the first call
    to exercise the retry ladder. Lives in the package (not test modules)
    so Ray actor workers can unpickle it by reference."""

    def __init__(self, fail_first: bool = False):
        self._fail_first = fail_first
        self._failed = False

    def complete(self, messages: List[Message]) -> str:
        if self._fail_first and not self._failed:
            self._failed = True
            raise TransientAPIError("scripted transient failure")
        body = messages[-1]["content"]
        if body.startswith("---分析报告---"):
            return f"FINAL({body.count('[')})"
        h = hashlib.sha1(body.encode()).hexdigest()[:8]
        return f"POINT-{h}"
