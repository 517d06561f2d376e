"""AnswerSession — the RAG chat state machine
(methods/answer-session.ts:1-229), ported minus the network layer.

The reference binds the session to the `orama-secure-proxy` plugin and
streams completions from Orama's hosted chat models; there is no LLM
service in this tier's environment, so the transport is an injectable
``chat_stream`` callable (messages -> iterator of text chunks) — the
exact seam the reference's ``proxy.chatStream`` occupies. Everything
observable around that seam is replicated: message-list layout (system
prompt first, user turn, empty assistant turn appended to per chunk),
the per-interaction state record (query / response / sources / loading
/ aborted / error), abort semantics, ``regenerate_last``'s
last-message-must-be-assistant guard, and the missing-plugin errors.

``sources`` holds the LAZY SearchResult (the caller collects) — on a
10^12-doc index the session must not force a collect per turn.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Callable, Iterable, Iterator, Optional

Message = dict  # {"role": "system"|"user"|"assistant", "content": str}


@dataclass
class Interaction:
    interaction_id: str
    query: str
    response: str = ""
    aborted: bool = False
    loading: bool = True
    sources: object = None       # lazy SearchResult
    translated_query: object = None
    error: bool = False
    error_message: Optional[str] = None


class AnswerSessionError(ValueError):
    pass


@dataclass
class AnswerSession:
    """RAG conversation over a SearchIndex.

    ``chat_stream(messages) -> Iterable[str]`` is the pluggable LLM
    transport (reference: secure-proxy chatStream). Omitting it raises
    the reference's PLUGIN_SECURE_PROXY_NOT_FOUND at first use.
    """

    index: object
    chat_stream: Optional[Callable[[list], Iterable[str]]] = None
    system_prompt: Optional[str] = None
    initial_messages: Optional[list] = None
    on_state_change: Optional[Callable[[list], None]] = None
    conversation_id: Optional[str] = None

    state: list = field(default_factory=list)
    _abort: bool = False
    _last_params: Optional[dict] = None
    _ids: Iterator[int] = field(default_factory=itertools.count)

    def __post_init__(self):
        self.messages: list = list(self.initial_messages or [])
        if self.system_prompt:
            self.messages.append(
                {"role": "system", "content": self.system_prompt}
            )
        if self.conversation_id is None:
            self.conversation_id = f"conv-{next(self._ids)}"

    # ------------------------------------------------------------ public
    def ask(self, **params) -> str:
        return "".join(self.ask_stream(**params))

    def ask_stream(self, **params) -> Iterator[str]:
        if self.chat_stream is None:
            raise AnswerSessionError("PLUGIN_SECURE_PROXY_NOT_FOUND")
        return self._fetch_answer(params)

    def abort_answer(self) -> None:
        self._abort = True
        if self.state:
            self.state[-1].aborted = True
        self._trigger()

    def get_messages(self) -> list:
        return self.messages

    def clear_session(self) -> None:
        self.messages = []
        self.state = []

    def regenerate_last(self, stream: bool = True):
        if not self.state or not self.messages:
            raise AnswerSessionError("No messages to regenerate")
        if self.messages[-1]["role"] != "assistant":
            raise AnswerSessionError(
                "ANSWER_SESSION_LAST_MESSAGE_IS_NOT_ASSISTANT"
            )
        self.messages.pop()
        self.state.pop()
        if stream:
            return self.ask_stream(**(self._last_params or {}))
        return self.ask(**(self._last_params or {}))

    # ----------------------------------------------------------- private
    def _fetch_answer(self, params: dict) -> Iterator[str]:
        self._abort = False
        self._last_params = params
        term = params.get("term", "") or ""
        inter = Interaction(
            interaction_id=f"{self.conversation_id}-i{next(self._ids)}",
            query=term,
        )
        self.messages.append({"role": "user", "content": term})
        self.state.append(inter)
        self.messages.append({"role": "assistant", "content": ""})
        self._trigger()
        try:
            inter.sources = self.index.search(**params)
            self._trigger()
            for chunk in self.chat_stream(self.messages):
                if self._abort:
                    raise _Aborted()
                yield chunk
                inter.response += chunk
                self.messages[-1]["content"] += chunk
                self._trigger()
        except _Aborted:
            inter.aborted = True
            self._trigger()
        except Exception as err:  # mirror fetchAnswer's catch-all
            inter.error = True
            inter.error_message = str(err)
            self._trigger()
        inter.loading = False
        self._trigger()

    def _trigger(self) -> None:
        if self.on_state_change:
            self.on_state_change(self.state)


class _Aborted(Exception):
    pass
